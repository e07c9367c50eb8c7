package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temperature-weighted corpus mixing — the data-mixing step of an
  * LLM pre-training pipeline: resample the corpus so each stratum's
  * share follows count^α (α < 1 flattens the natural distribution,
  * upweighting rare strata — the multilingual-sampling trick) instead
  * of its raw share. Strata here are the `lang` column, whose counts
  * are genuinely skewed in the fixture (en ≈ 2.4× de).
  *
  * Mechanics are [[ParamFilters.qStratifiedSample]]'s, with computed
  * rather than proportional quotas: weight = √count per stratum,
  * largest-remainder rounding so quotas sum exactly to the target,
  * and a deterministic md5 rank standing in for the random draw (so
  * the oracle can replay the selection). The quota table is one row
  * per stratum — per-stratum aggregates and its windows are trivially
  * bounded, and it broadcasts back onto the corpus. The corpus side
  * is first pruned to each stratum's TargetN first-ranked docs by the
  * bounded-heap [[graft.plans.GroupedTopK]] operator, so no stratum
  * is ever fully sorted (quotas never exceed TargetN): the same
  * 100 TB posture as the stratified sampler.
  *
  * A stratum with fewer docs than its quota yields everything it has
  * (the rn ≤ quota join can't invent rows), so the output can fall
  * short of TargetN on degenerate corpora — under-filling honestly
  * rather than silently reweighting the other strata.
  */
object Mixing {

  private val TargetN = 200
  // α = 0.5 (weight = count^α = √count): both engines' sqrt is the
  // correctly-rounded IEEE one, so quota arithmetic is bit-identical
  private def weight = sqrt(col("g_cnt").cast("double"))

  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("lang"))
    val quotas = docs.groupBy("lang").agg(count(lit(1)).as("g_cnt"))
      .withColumn("w", weight)
      .withColumn("ideal", lit(TargetN) * col("w") / sum("w").over(wAll))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(TargetN) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
      .select("lang", "quota")
    val ranked = docs.select(col("lang"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("rk"))
    val pruned = graft.plans.GroupedTopKApi.groupedTopKOrdered(ranked,
      keys = Seq("lang"),
      sort = Seq("rk" -> true, "doc_id" -> true),
      k = TargetN)
    val wRank = Window.partitionBy("lang").orderBy(col("rk"), col("doc_id"))
    pruned
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .join(broadcast(quotas), "lang")
      .where(col("rn") <= col("quota"))
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  private val TokenBudget = 20000L

  /** Token-budget mixing — [[qTemperatureMix]]'s sibling that budgets
    * what training actually consumes: allocate a global TOKEN budget
    * across sources ∝ √(source token mass) (largest-remainder in
    * whole tokens: each floor loses under one token, so the leftover
    * is below the source count and the +1 redistribution applies
    * unchanged), then fill each source's quota greedily in the same
    * deterministic md5 order — a document is selected iff the running
    * token sum through it still fits the quota, so Σ selected tokens
    * ≤ quota per source and ≤ budget overall, exactly.
    *
    * Scale posture mirrors the other quota samplers: the quota table
    * is one row per source (broadcast back), and the per-source
    * prefix scan is bounded BEFORE the window by a [[graft.plans.GroupedTopK]]
    * prune to budget-many docs (a quota of B tokens can consume at
    * most B one-token docs) — no source is ever fully sorted. */
  def qTokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_tok"))
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("source"))
    val quotas = docs.groupBy("source").agg(sum("n_tok").as("g_tok"))
      .withColumn("w", sqrt(col("g_tok").cast("double")))
      .withColumn("ideal", lit(TokenBudget) * col("w") / sum("w").over(wAll))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(TokenBudget) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        (col("base") + when(col("rr") <= col("leftover"), 1.0).otherwise(0.0))
          .cast("long"))
      .select("source", "quota")
    val ranked = docs.withColumn("rk", md5(col("doc_id").cast("string")))
    val pruned = graft.plans.GroupedTopKApi.groupedTopKOrdered(ranked,
      keys = Seq("source"),
      sort = Seq("rk" -> true, "doc_id" -> true),
      k = TokenBudget.toInt)
    val wCum = Window.partitionBy("source").orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pruned
      .withColumn("cum", sum("n_tok").over(wCum))
      .join(broadcast(quotas), "source")
      .where(col("cum") <= col("quota"))
      .select(col("source"), col("doc_id"), col("n_tok").as("n_bpe_tokens"))
      .orderBy("source", "doc_id")
  }
}
