package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Corpus drift / PSI (q_corpus_drift): the oracle gate pins the
  * rows; this spec pins the index's defining properties — zero for
  * identical versions, strictly positive under a real length-mix
  * shift, always non-negative, and histogrammed over the fixed
  * 10-bucket grid regardless of content.
  */
class CorpusDriftSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("identical versions drift zero in every bucket") {
    val out = Pipeline.corpusDrift(docs, docs).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4)) // p1 == p2
      assert(r.getDouble(5) == 0.0)            // psi_term
    }
  }

  test("a length-mix shift yields strictly positive total PSI, all terms non-negative") {
    // v2 truncates every doc to 80 chars: mass moves to bucket 0
    val shifted = docs.withColumn("text", substring(col("text"), 1, 80))
    val out = Pipeline.corpusDrift(docs, shifted).collect()
    val terms = out.map(_.getDouble(5))
    assert(terms.forall(_ >= 0.0))
    assert(terms.sum > 0.01)
  }

  test("the streaming monitor's merged histogram equals the one-shot PSI") {
    val batch = Pipeline.qCorpusDrift(spark, sf).collect().map(_.toSeq)
    val stream = graft.streaming.StreamReplays.qStreamCorpusDrift(spark, sf)
      .collect().map(_.toSeq)
    assert(stream.toSeq == batch.toSeq)
  }

  test("empty-versus-corpus drift stays finite (Laplace smoothing)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Pipeline.corpusDrift(empty, docs).collect()
    assert(out.length == 10)
    assert(out.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }
}
