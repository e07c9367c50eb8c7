package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * intersect / except cardinalities in one row. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def custsIn(y: Int) = orders
      .where(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct()
    val a = custsIn(1994)
    val b = custsIn(1995)
    val u = a.union(b).distinct().count()
    val i = a.intersect(b).count()
    val e = a.except(b).count()
    import spark.implicits._
    Seq((u, i, e)).toDF("union_count", "intersect_count", "except_count")
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
    * its configured 2% rsd ×2.5, percentile sketch within 5%). A
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
        (abs(col("hll_users") - col("n_users")) <= col("n_users") * lit(0.05))
          .as("hll_within_5pct"),
        (abs(col("p50_sketch") - col("p50_exact")) <=
          greatest(abs(col("p50_exact")) * lit(0.05), lit(0.05)))
          .as("p50_within_5pct"))
      .orderBy("event_type")
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
