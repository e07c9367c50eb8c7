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
  * Near-dup rule: for every verified pair (a < b) whose both sides
  * survived the earlier stages, drop b — deterministic, one pass, no
  * iterative connected components (documented simplification; at
  * 100 TB a connected-components pass over the tiny verified-pair
  * set is cheap if cluster-canonical choice matters).
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

    // stage 1: quality gate
    val gated = docs
      .withColumn("quality", Text.roundPortable(quality, 4))
      .withColumn("n_tokens", nTok.cast("long"))
      .where(col("quality") >= QualityThreshold)

    // stage 2: exact dedup (canonical = min doc_id per content hash)
    val wExact = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val exact = gated.withColumn("rn", row_number().over(wExact))
      .where(col("rn") === 1).drop("rn")

    // stage 3: near-dup removal from the LSH-verified pairs
    val pairs = Dedup.qDedupMinhashLsh(spark, dir).select("doc_a", "doc_b")
    val ids = exact.select(col("doc_id"))
    val drops = pairs
      .join(ids.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(ids.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
      .select(col("doc_b").as("doc_id")).distinct()

    exact.join(drops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_tokens", "quality")
      .orderBy("doc_id")
  }
}
