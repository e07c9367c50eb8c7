package graft

import graft.operators.Mixing

/** Waterfilling budget allocation (q_budget_waterfill): the oracle
  * gate pins the rows; this spec pins the allocation's defining
  * invariants on crafted histograms and the fixture — exact budget
  * exhaustion, uncapped-keep-all, and the even split (±1) of the
  * residual among capped sources.
  */
class BudgetWaterfillSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, Long)], budget: Long) =
    Mixing.waterfill(rows.toDF("source", "n_tok"), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("textbook waterfill: small sources ride free, the big one absorbs the cap") {
    val out = run(Seq(("a", 100L), ("b", 200L), ("c", 700L)), 600L)
    // a,b fit whole; c gets the residual 600-300
    assert(out.toSet == Set(("a", 100L, 100L, false), ("b", 200L, 200L, false),
      ("c", 700L, 300L, true)))
  }

  test("remainder goes +1 to the lexicographically-first capped sources") {
    val out = run(Seq(("a", 10L), ("b", 10L), ("c", 10L)), 8L)
    assert(out.toSet == Set(("a", 10L, 3L, true), ("b", 10L, 3L, true),
      ("c", 10L, 2L, true)))
  }

  test("budget above the corpus leaves every source uncapped and whole") {
    val out = run(Seq(("a", 5L), ("b", 7L)), 100L)
    assert(out.toSet == Set(("a", 5L, 5L, false), ("b", 7L, 7L, false)))
  }

  test("fixture invariants: exact exhaustion, capped within ±1, uncapped keep all") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val counts = docs.select(org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.size(
        graft.functions.Text.tokens(org.apache.spark.sql.functions.col("text")))
        .cast("long").as("n_tok"))
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_tok").as("n_tok"))
    val out = Mixing.waterfill(counts, Mixing.WaterfillBudget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.map(_._3).sum == Mixing.WaterfillBudget)
    val (capped, uncapped) = out.partition(_._4)
    assert(capped.nonEmpty && uncapped.nonEmpty) // both regimes exercised
    uncapped.foreach(t => assert(t._3 == t._2))
    capped.foreach(t => assert(t._3 <= t._2))
    assert(capped.map(_._3).max - capped.map(_._3).min <= 1)
    // water level: every uncapped source sits at or below the cap
    assert(uncapped.map(_._2).max <= capped.map(_._3).max)
  }
}
