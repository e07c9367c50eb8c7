package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

/** Properties of the round-7 training-pipeline additions the oracle
  * gate can't see: the two-phase prefix sum must equal the naive
  * global window (the oracle checks the final assignment, this checks
  * it for ANY bucket width via the engine-side reference), and
  * decontamination must never flag the eval slice itself. */
class PackingSpec extends SparkSpec {

  test("two-phase packing equals the naive single-window prefix sum") {
    val packed = Packing.qPackSequences(spark, sf)
      .collect().map(_.toSeq).toSet
    // reference: the single-partition global window (fine at sf0.001)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .withColumn("start_offset", sum("n_bpe_tokens").over(w) - col("n_bpe_tokens"))
      .select(col("doc_id"), col("n_bpe_tokens"),
        expr("start_offset DIV 256").as("seq_id"),
        pmod(col("start_offset"), lit(256L)).cast("long").as("seq_offset"))
      .collect().map(_.toSeq).toSet
    assert(packed == naive,
      s"diff=${(packed diff naive).take(3)} / ${(naive diff packed).take(3)}")
  }

  test("sequence offsets stay inside the budget; ids start at 0 and never decrease") {
    val rows = Packing.qPackSequences(spark, sf)
      .orderBy("doc_id").select("seq_id", "seq_offset").collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    val seqIds = rows.map(_.getLong(0))
    assert(seqIds.head == 0L)
    // a doc longer than the budget may span sequences (jump > 1);
    // packing in id order can never go backwards
    assert(seqIds.zip(seqIds.tail).forall { case (a, b) => b >= a })
  }

  test("global shuffle is a permutation of 0..n-1 that differs from id order") {
    val pos = Packing.qGlobalShuffle(spark, sf)
      .orderBy("doc_id").select("position").collect().map(_.getLong(0))
    assert(pos.sorted.toSeq == (0L until pos.length).toSeq,
      "positions must be exactly 0..n-1")
    // astronomically unlikely for a hash order to equal id order
    assert(pos.toSeq != (0L until pos.length).toSeq, "order was not shuffled")
  }

  test("decontamination never flags the eval slice and counts are positive") {
    val out = TextAnalysis.qDecontaminate(spark, sf).collect()
    assert(out.nonEmpty, "fixture has planted near-dups of eval docs")
    assert(out.forall(_.getLong(0) % 20 != 0), "eval docs must not self-flag")
    assert(out.forall(_.getLong(1) >= 1))
  }
}
