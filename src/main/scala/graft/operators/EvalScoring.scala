package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Eval-answer scoring — the benchmark-grading operators an LLM
  * pipeline runs over (prediction, reference) pairs at scale:
  * normalized exact match and token-level F1 (the SQuAD-style
  * scoring pair). Both are PER-PAIR scalar projections: normalize,
  * tokenize, and fold entirely inside the row — no shuffle, no model
  * state, whole plan is one scan of the paired frame. A grading job
  * over a billion generations is embarrassingly parallel and this
  * plan keeps it that way.
  *
  * Token F1 uses MULTISET overlap (Σ_t min(count_pred(t),
  * count_ref(t))) computed with higher-order array functions over
  * the distinct-token list — O(L²) element ops per row, bounded by
  * document length, constant per row at any corpus scale (the
  * text_repetition precedent, same oracle idiom).
  *
  * The fixture has no model outputs, so the gate builds a
  * deterministic pair table from `documents`: every 5th doc is
  * paired with ITSELF (the exact-match regime) and the rest with
  * their id-successor (the partial-overlap regime) — both engines
  * derive the same pairs, and both scoring branches execute.
  */
object EvalScoring {

  private def norm(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Multiset token overlap of two token-array columns. */
  private def multisetOverlap(p: Column, r: Column): Column =
    aggregate(
      transform(array_distinct(p), t =>
        least(size(filter(p, x => x === t)), size(filter(r, x => x === t)))),
      lit(0), (acc, x) => acc + x)

  /** Score a (pair_id, pred, ref) frame: normalized exact match +
    * token F1. Pure per-row projection. */
  private[graft] def scorePairs(pairs: DataFrame): DataFrame = {
    val scored = pairs
      .withColumn("pt", Text.tokens(norm(col("pred"))))
      .withColumn("rt", Text.tokens(norm(col("ref"))))
      .withColumn("np", size(col("pt")))
      .withColumn("nr", size(col("rt")))
      .withColumn("ov", multisetOverlap(col("pt"), col("rt")))
    scored.select(
      col("pair_id"),
      when(norm(col("pred")) === norm(col("ref")), 1L).otherwise(0L)
        .as("exact_match"),
      col("ov").cast("long").as("n_overlap"),
      Text.roundPortable(
        when(col("np") + col("nr") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("ov") / (col("np") + col("nr"))), 4)
        .as("token_f1"))
      .orderBy("pair_id")
  }

  /** Gate entry: deterministic pairs from `documents` — every 5th
    * doc scored against itself, the rest against their id-successor
    * (inner join drops the last id's missing successor). */
  def qEvalTokenF1(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val pred = docs.select(col("doc_id").as("pair_id"), col("text").as("pred"),
      when(pmod(col("doc_id"), lit(5)) === 0, col("doc_id"))
        .otherwise(col("doc_id") + 1).as("ref_id"))
    val refs = docs.select(col("doc_id").as("ref_id"), col("text").as("ref"))
    scorePairs(pred.join(refs, "ref_id").select("pair_id", "pred", "ref"))
  }

  // 16^6 — the hash24 space (the q_quality_sample draw convention)
  private val Hash24Space = 16777216L

  /** MAJORITY-VOTE LABEL AGGREGATION — the annotation-QA reducer for
    * multiply-labeled data (RLHF preference collection, quality
    * raters, weak supervision): per item, the modal label across
    * raters, how many raters back it, and whether the panel was
    * unanimous. Ties break to the lexicographically-smaller label so
    * the vote is deterministic for any rater count.
    *
    * Scale shape: ONE (item, label) partial-agg shuffle (rater rows
    * combine map-side) + the arg-max as a (cnt DESC, label) window
    * per item over label-count rows — labels per item ≤ raters, so
    * the window frames are panel-sized, never corpus-sized.
    *
    * The fixture carries no annotations, so the gate SYNTHESIZES a
    * deterministic 3-rater panel (the PII-injection precedent): each
    * rater starts from the doc's `lang` and corrupts it to "zz"
    * when the proven cross-engine hash24(doc_id·3 + rater) draw
    * falls under rater·5 % — rater 1 is the careful one, rater 3 the
    * sloppy one, and both agreement regimes execute. */
  def qEvalMajorityVote(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val votes = docs
      .select(col("doc_id"), col("lang"),
        explode(array(lit(1), lit(2), lit(3))).as("rater"))
      .withColumn("draw",
        conv(substring(md5((col("doc_id") * 3 + col("rater")).cast("string")),
          1, 6), 16, 10).cast("long"))
      .withColumn("label",
        when(col("draw") * 20 < lit(Hash24Space) * col("rater"), lit("zz"))
          .otherwise(col("lang")))
    majorityVote(votes.select(col("doc_id").as("item_id"),
      col("rater"), col("label")))
  }

  /** Core over an (item_id, rater, label) frame. */
  private[graft] def majorityVote(votes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("item_id")
      .orderBy(desc("cnt"), col("label"))
    votes
      .groupBy("item_id", "label").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_raters", sum("cnt").over(Window.partitionBy("item_id")))
      .where(col("rk") === 1)
      .select(col("item_id"), col("label").as("maj_label"),
        col("cnt").as("n_agree"),
        (col("cnt") === col("n_raters")).as("unanimous"))
      .orderBy("item_id")
  }
}
