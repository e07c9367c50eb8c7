package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operators (SURVEY.md §2.1–§2.4) re-expressed over
  * the driver fixtures. Each query is declarative DataFrame API so
  * Catalyst handles pushdown / pruning / join selection; results are
  * deterministic (orderBy on key columns where ties are impossible,
  * doubles rounded) so they hash-compare against the DuckDB oracle.
  */
object Relational {

  /** Conditional aggregation over the fact table — the Spark-first
    * replacement of the reference's string-packed accumulator
    * (reference: spark/session/SessionAggrStatAccumulator.java:18-90,
    * UserVisitSessionAnalyzeSpark.java:1021-1114): one pass of
    * count(when(...)) buckets instead of a custom accumulator.
    * Shape is TPC-H Q1: partial (map-side) agg then final — two-phase
    * HashAggregate, no extra shuffle beyond the group keys.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        graft.functions.Text.roundPortable(sum("l_quantity"), 2).as("sum_qty"),
        graft.functions.Text.roundPortable(sum("l_extendedprice"), 2).as("sum_base_price"),
        graft.functions.Text.roundPortable(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        graft.functions.Text.roundPortable(avg("l_discount"), 6).as("avg_disc"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Projected + filtered scan (reference: AreaTop3ProductSpark.java:138-172
    * — `SELECT city_id, click_product_id ... WHERE click_product_id IS
    * NOT NULL AND date between`). Filter + projection reach the parquet
    * scan (PushedFilters / ReadSchema). */
  def qScanFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
             col("l_discount") > 0.05)
      .select("l_orderkey", "l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_partkey", "l_quantity")
  }

  /** Broadcast-joined fact⋈dim (reference: AreaTop3ProductSpark.java:243-296
    * click actions ⋈ city_info). nation/region are tiny dims —
    * explicitly broadcast so no shuffle of the fact side happens. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val cust   = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_customers"),
           graft.functions.Text.roundPortable(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy("region_name", "nation_name")
  }

  /** Large-side shuffle join: orders ⋈ customer with aggregation
    * (reference: UserVisitSessionAnalyzeSpark.java:441 sessions⋈users).
    * Both sides big at scale → sort-merge/shuffled-hash on the join
    * key; partial aggregation happens before the exchange. */
  def qJoinShuffle(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val cust   = Tables.customer(spark, dir)
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.Text.roundPortable(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Left-semi join — "keep fact rows whose key appears in the
    * filtered set" (reference pattern: UserVisitSessionAnalyzeSpark
    * .java:679-698 filtered-session ids ⋈ raw actions). */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(spark, dir)
    val big = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 150000.0)
    li.join(big, li("l_orderkey") === big("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
           graft.functions.Text.roundPortable(sum("l_quantity"), 2).as("qty"))
      .orderBy("l_returnflag")
  }

  /** Left-anti join — blacklist filtering in one operator (reference:
    * AdClickRealTimeSpark.java:181-202 does left-outer join + filter;
    * anti-join is the fused Spark-first form). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust   = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 300000.0) // customers with no large order
    cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers_without_orders"))
      .orderBy("c_mktsegment")
  }

  /** Left-outer join with zero-fill (reference: UserVisitSessionAnalyze
    * Spark.java:1520-1610 — three left joins + absent⇒0). Dim side is
    * all parts; counts joined back with coalesce(cnt,0). */
  def qLeftJoinZerofill(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    val cnts = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), graft.functions.Text.roundPortable(sum("l_quantity"), 2).as("qty"))
    part.join(cnts, part("p_partkey") === cnts("l_partkey"), "left")
      .select(col("p_partkey"),
              coalesce(col("cnt"), lit(0L)).as("order_count"),
              coalesce(col("qty"), lit(0.0)).as("total_qty"))
      .orderBy("p_partkey")
  }

  /** Multi-key descending sort + limit (reference: CategorySortKey
    * secondary sort + sortByKey(false) + take(10),
    * UserVisitSessionAnalyzeSpark.java:1239-1272). Spark-first: a
    * TakeOrderedAndProject, not a full sort. */
  def qTopKMultiSort(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(
        count(when(col("l_returnflag") === "R", 1)).as("click_count"),
        count(when(col("l_returnflag") === "A", 1)).as("order_count"),
        count(when(col("l_returnflag") === "N", 1)).as("pay_count"))
      .orderBy(desc("click_count"), desc("order_count"), desc("pay_count"),
               col("l_partkey"))
      .limit(10)
  }
}
