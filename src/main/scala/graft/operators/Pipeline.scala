package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** The end-to-end training-data curation pipeline — the composition
  * the individual operators exist for: quality gate → exact dedup →
  * LSH near-dup removal → curated corpus with token budget. Each
  * stage is one of the independently oracle-verified operators; the
  * composition itself is also oracle-checked.
  *
  * Stage order IS the optimization: the quality gate and exact dedup
  * are pure projections/one-hash-shuffle, so they run first and the
  * expensive stage — shingle/minhash signatures + the LSH band join —
  * only ever sees the surviving documents. Restricting LSH to
  * survivors is exact, not an approximation: a pair is a candidate
  * iff the two docs share a band bucket and is verified pairwise, so
  * pairs among survivors are identical whether or not dropped docs
  * participated. The survivor set and its signatures are each
  * materialized once and reused (the signature table feeds the band
  * join twice and the verify join twice).
  *
  * Near-dup rule: for every verified pair (a < b) whose both sides
  * survived the earlier stages, drop b — deterministic, one pass, no
  * iterative connected components (cluster-canonical choice, when it
  * matters, is `Dedup.qDedupClusters`' distributed label
  * propagation over the same verified pairs).
  */
object Pipeline {

  private val QualityThreshold = 0.35

  def qTrainingPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = Text.tokens(col("text"))
    val nTok = size(toks)
    val quality =
      lit(0.4) * least(nTok.cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * (size(array_distinct(toks)).cast("double") / nTok) +
      lit(0.3) * (size(filter(toks,
        t => t.isin("the", "a", "and", "of", "to"))).cast("double") / nTok)

    // stage 1: quality gate (projection-only — no shuffle)
    val gated = docs
      .withColumn("quality", Text.roundPortable(quality, 4))
      .withColumn("n_tokens", nTok.cast("long"))
      .where(col("quality") >= QualityThreshold)

    // stage 2: exact dedup (canonical = min doc_id per content hash)
    val wExact = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val exact = gated.withColumn("rn", row_number().over(wExact))
      .where(col("rn") === 1).drop("rn")
      .cache()

    // stage 3: near-dup removal — signatures + LSH over survivors only
    val sigs = Dedup.signaturesOf(exact.select("doc_id", "text")).cache()
    val drops = Dedup.lshVerifiedPairs(sigs)
      .select(col("doc_b").as("doc_id")).distinct()

    exact.join(drops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_tokens", "quality")
      .orderBy("doc_id")
  }
}
