package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Analytic capabilities beyond the reference's surface (the
  * reference uses only row_number and has no set operations or
  * grouping sets — SURVEY §2.5/§2.7): frame-spec windows, lead/lag
  * analytics, union/intersect/except, rollup. A user of the reference
  * switching here gets these for free; they're part of the
  * "complete engine" story.
  */
object Analytic {

  /** Frame-spec window: per-customer running revenue + order gap in
    * days (rowsBetween cumulative frame, lag analytics). */
  def qRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .where(col("o_custkey") < 100)
      .withColumn("running_revenue",
        graft.functions.Text.roundPortable(sum("o_totalprice")
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
              graft.functions.Text.roundPortable(col("o_totalprice"), 2).as("total_price"),
              col("running_revenue"), col("gap_days"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set operations: customers active in 1994 vs 1995 — union /
    * intersect / except cardinalities in one row. Computed as a
    * SINGLE pass: one scan bucketing each customer into (in 1994?,
    * in 1995?) membership flags, then conditional counts — the
    * full-outer-join formulation of union/intersect/except. The
    * literal union/intersect/except chain would be three separate
    * driver actions, i.e. three jobs re-scanning orders six times. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .where(year(col("o_orderdate")).isin(1994, 1995))
      .groupBy("o_custkey")
      .agg(max(when(year(col("o_orderdate")) === 1994, 1).otherwise(0)).as("in_a"),
           max(when(year(col("o_orderdate")) === 1995, 1).otherwise(0)).as("in_b"))
      .agg(count(lit(1)).as("union_count"),
           count(when(col("in_a") === 1 && col("in_b") === 1, 1)).as("intersect_count"),
           count(when(col("in_a") === 1 && col("in_b") === 0, 1)).as("except_count"))
  }

  /** Cube over (returnflag, linestatus): all four grouping
    * combinations in one pass (completes the grouping-sets family
    * next to [[qRollup]]). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text.roundPortable
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           roundPortable(sum("l_quantity"), 2).as("qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("n"), col("qty"))
      .orderBy("returnflag", "linestatus")
  }

  /** Exact distinct counts + exact interpolated percentiles per
    * group (the OLAP summary surface; at 100 TB these swap to
    * approx_count_distinct / percentile_approx sketches — exact here
    * so the oracle can check the plumbing). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text.roundPortable
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        roundPortable(expr("percentile(value, 0.5)"), 4).as("p50_value"),
        roundPortable(expr("percentile(value, 0.95)"), 4).as("p95_value"))
      .orderBy("event_type")
  }

  /** Sketch twins of [[qPercentiles]]: approx_count_distinct (HLL++)
    * and percentile_approx (KLL-style) next to their exact
    * counterparts, the summary surface actually used at 100 TB where
    * exact countDistinct is a full shuffle of every distinct key.
    * The sketches are non-deterministic across engines, so the gate
    * asserts a *tolerance contract* the oracle can check exactly:
    * the exact values plus booleans that must all be true (HLL within
    * its configured 2% rsd ×4 — wide enough that fixture
    * regeneration can't flip it by chance, tight enough that a
    * broken sketch still fails — percentile sketch within 5%). A
    * drifting sketch flips a boolean and fails the hash. */
  def qApproxSketch(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        approx_count_distinct("user_id", 0.02).as("hll_users"),
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile_approx(value, 0.5, 10000)").as("p50_sketch"))
      .select(
        col("event_type"), col("n_users"),
        (abs(col("hll_users") - col("n_users")) <= col("n_users") * lit(0.08))
          .as("hll_within_8pct"),
        (abs(col("p50_sketch") - col("p50_exact")) <=
          greatest(abs(col("p50_exact")) * lit(0.05), lit(0.05)))
          .as("p50_within_5pct"))
      .orderBy("event_type")
  }

  /** Count-min frequency sketch, built as plain aggregation — the
    * frequency-estimation sibling of [[qApproxSketch]]'s cardinality
    * sketch. d=3 hash rows × w=64 counters; each event increments one
    * counter per row, an estimate is the MIN of a key's d counters
    * (only collisions inflate, never deflate — so est ≥ true always,
    * asserted per-row in the output). The counter build is one
    * groupBy over (row, bucket): the partial/final HashAggregate IS
    * the sketch merge (counters sum elementwise), which is what makes
    * count-min the 100 TB idiom — a 3×64 table summarizes any number
    * of partitions/days and two sketches union by addition. Hashes
    * are fixed multiplicative congruences ((k%P)·a+b mod P mod w, all
    * literals pre-reduced), so the whole sketch is deterministic and
    * the DuckDB oracle reproduces it counter for counter. Queried
    * keys (user_id ≡ 0 mod 7) stand in for a hot-key watchlist. */
  def qCmSketch(spark: SparkSession, dir: String): DataFrame = {
    val W = 64
    val P = 1000000007L
    val A = Seq(654435747L, 246822505L, 266489896L)
    val B = Seq(1L, 7L, 13L)
    def bucketOf(key: Column, i: Int): Column =
      pmod(pmod(key, lit(P)) * lit(A(i)) + lit(B(i)), lit(P)) % lit(W)
    val e = Tables.eventsNorm(spark, dir).select("user_id")
    val counters = e
      .select(explode(array((0 until 3).map(i =>
        struct(lit(i).as("row_id"), bucketOf(col("user_id"), i).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val watch = e.where(pmod(col("user_id"), lit(7)) === 0)
      .groupBy("user_id").agg(count(lit(1)).as("true_count"))
    val est = watch
      .select(col("user_id"), col("true_count"),
        explode(array((0 until 3).map(i =>
          struct(lit(i).as("row_id"), bucketOf(col("user_id"), i).as("bucket"))): _*))
          .as("rb"))
      .select(col("user_id"), col("true_count"),
        col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
      .join(counters, Seq("row_id", "bucket"))
      .groupBy("user_id")
      .agg(first("true_count").as("true_count"), min("c").as("est_count"))
    est
      .select(col("user_id"), col("true_count"), col("est_count"),
        (col("est_count") >= col("true_count")).as("never_underestimates"))
      .orderBy("user_id")
  }

  /** Rollup over the region/nation hierarchy with grouping flags —
    * subtotals + grand total in one pass. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           graft.functions.Text.roundPortable(sum("c_acctbal"), 2).as("total_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"), col("total_acctbal"))
      .orderBy("region_name", "nation_name")
  }
}
