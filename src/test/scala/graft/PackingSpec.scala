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

  test("epoch pack covers exactly the resample's copies with a contiguous token layout") {
    val packed = graft.operators.Pipeline.qEpochPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val copies = graft.operators.Mixing.qMixEpochs(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    // every epoch copy is packed exactly once — the pack stage can't
    // drop or duplicate what the resample emitted
    assert(packed.map(t => (t._1, t._2)).toSet == copies)
    assert(packed.length == copies.size)
    // contiguity: reassembling start offsets (seq_id·256 + offset) in
    // ascending order must tile the token stream with no gap/overlap
    val starts = packed.map(t => (t._4 * 256 + t._5, t._3)).sortBy(_._1)
    starts.foldLeft(0L) { case (expected, (start, n)) =>
      assert(start == expected, s"offset $start, expected $expected")
      expected + n
    }
    assert(packed.forall(t => t._5 >= 0 && t._5 < 256))
  }

  test("global shuffle is a permutation of 0..n-1 that differs from id order") {
    val pos = Packing.qGlobalShuffle(spark, sf)
      .orderBy("doc_id").select("position").collect().map(_.getLong(0))
    assert(pos.sorted.toSeq == (0L until pos.length).toSeq,
      "positions must be exactly 0..n-1")
    // astronomically unlikely for a hash order to equal id order
    assert(pos.toSeq != (0L until pos.length).toSeq, "order was not shuffled")
  }

  test("hash-prefix fan-out follows √n: fixed at 256 below 64k rows, growing after") {
    // per-task window state in both phases of the hash-prefix prefix
    // sums is ~n/16^len and ~16^len — balanced at len ≈ log16 √n.
    // The round-8 fixed len=2 left phase 1 at n/256, linear in n.
    assert(Packing.hashPrefixLenFor(1L) == 2)
    assert(Packing.hashPrefixLenFor(500L) == 2)
    assert(Packing.hashPrefixLenFor(65536L) == 2)      // √ = 256 = 16²
    assert(Packing.hashPrefixLenFor(1000L * 1000) == 3)       // √ = 10³ ≤ 16³
    assert(Packing.hashPrefixLenFor(100L * 1000 * 1000) == 4) // √ = 10⁴ ≤ 16⁴
    assert(Packing.hashPrefixLenFor(1000L * 1000 * 1000 * 1000) == 5)
    assert(Packing.hashPrefixLenFor(Long.MaxValue) == 8) // cap holds
  }

  test("global-shuffle positions are invariant to the internal prefix length") {
    // the bucket key is a prefix of the sort key at ANY length, so the
    // two-phase decomposition must produce bit-identical positions —
    // this is what lets the fan-out follow the footer count while the
    // oracle stays unchanged
    val docs = Tables.documents(spark, sf)
    val ref = Packing.globalShuffleRanked(docs, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (len <- Seq(2, 3)) {
      val got = Packing.globalShuffleRanked(docs, len)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"prefixLen=$len diverged")
    }
  }

  test("decontamination never flags the eval slice and counts are positive") {
    val out = TextAnalysis.qDecontaminate(spark, sf).collect()
    assert(out.nonEmpty, "fixture has planted near-dups of eval docs")
    assert(out.forall(_.getLong(0) % 20 != 0), "eval docs must not self-flag")
    assert(out.forall(_.getLong(1) >= 1))
  }

  test("bloom-prefiltered decontamination returns exactly the exact operator's rows") {
    val exact = TextAnalysis.qDecontaminate(spark, sf)
      .collect().map(_.toSeq).toSeq
    val bloomed = TextAnalysis.qDecontaminateBloom(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(exact.nonEmpty && bloomed == exact,
      "one-sided prefilter + exact verify must not change the output")
  }

  test("bloom prefilter passes every true hit and prunes disjoint shingles") {
    import spark.implicits._
    // eval vocabulary is disjoint from most train docs: only doc 100
    // (a verbatim copy) shares any 4-gram; docs 101+ must be pruned
    // by the filter, not just by the verify join
    val evalText = "alpha beta gamma delta epsilon zeta"
    val docs = (Seq((0L, evalText), (100L, evalText)) ++
      (101L to 160L).map(i => i -> s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminateBloom(docs, col("doc_id") === 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(100L -> 3L),
      s"only the verbatim copy shares 4-grams (3 of them), got ${out.toSeq}")
  }
}
