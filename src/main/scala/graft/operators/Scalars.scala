package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.8): JSON extraction, date
  * bucketing/formatting, string composition — all codegen'd
  * built-ins, no UDFs in the hot path.
  */
object Scalars {

  /** JSON field extraction + aggregation (reference:
    * `get_json_object(extend_info,'product_status')`,
    * AreaTop3ProductSpark.java:453 — note the reference omits the
    * `$.` path prefix, tolerated by Hive; Spark requires it). */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.eventsNorm(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
              col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), graft.functions.Text.roundPortable(sum("value"), 2).as("total_value"))
      .orderBy("k")
  }

  /** Date parse/format/bucket (reference: util/DateUtils.java:11-180 —
    * yyyyMMdd keys, date_hour composite keys). Monthly rollup via
    * date_format; the composite "date_hour" string key of the
    * reference becomes real derived columns. */
  def qDateBuckets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.Text.roundPortable(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")
  }

  /** Hour-of-day histogram over the event stream (reference:
    * DateUtils.getDateHour composite key, util/DateUtils.java:88-94;
    * used for the per-(date,hour) session counts at
    * UserVisitSessionAnalyzeSpark.java:736). */
  def qDateHour(spark: SparkSession, dir: String): DataFrame = {
    Tables.eventsNorm(spark, dir)
      .groupBy(date_format(col("event_time"), "yyyy-MM-dd").as("date"),
               hour(col("event_time")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("date", "hour")
  }

  /** Pivot: long→wide reshape (per-day counts fanned out into one
    * column per event type). With the value list given explicitly the
    * plan is a single aggregate — no extra pass to discover values. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val kinds = Seq("view", "click", "purchase", "signup", "error")
    Tables.eventsNorm(spark, dir)
      .groupBy(date_format(col("event_time"), "yyyy-MM-dd").as("date"))
      .pivot("event_type", kinds)
      .agg(count(lit(1)))
      .na.fill(0L, kinds)
      .orderBy("date")
  }

  /** The SQL-text interface end-to-end (reference job 3 is chained
    * `sqlContext.sql` over temp tables, AreaTop3ProductSpark.java:
    * 296-510): register the fixtures as views and run one CTE-chained
    * statement through the parser — same Catalyst plan as the
    * DataFrame form, no temp-table round trips. */
  def qSqlInterface(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """WITH order_rev AS (
           SELECT o_custkey, count(*) AS n_orders,
                  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
           FROM orders GROUP BY o_custkey)
         SELECT c_mktsegment,
                count(*) AS n_customers,
                floor(sum(revenue) * 100 + 0.5) / 100 AS segment_revenue,
                max(n_orders) AS max_orders
         FROM customer JOIN order_rev ON c_custkey = o_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""")
  }

  /** CSV-packed multi-value cell → `explode(split(...))` (the
    * reference's signature storage idiom: `order_category_ids` packs
    * many category ids into one comma-joined string column, unpacked
    * with flatMap-over-split at UserVisitSessionAnalyzeSpark.java:
    * 1398-1441). Stage 1 PACKS per-order part ids into that shape;
    * stage 2 is the operator under test — split + explode back to one
    * row per id, then count orders per part (top 20). The explode is
    * a generator inside whole-stage codegen, no UDTF registration. */
  def qCsvExplode(spark: SparkSession, dir: String): DataFrame = {
    val packed = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(concat_ws(",",
        sort_array(collect_set(col("l_partkey").cast("string")))).as("part_ids"))
    packed
      .select(explode(split(col("part_ids"), ",")).as("part_id_s"))
      .select(col("part_id_s").cast("long").as("part_id"))
      .groupBy("part_id")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_id"))
      .limit(20)
  }

  /** String composition + conditional mapping (reference:
    * ConcatLongStringUDF.java:8-16 `concat_long_string(id,':',name)`
    * and the product_status if() at AreaTop3ProductSpark.java:453 —
    * both are plain built-ins in Spark, no UDF registration needed). */
  def qConcatConditional(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .select(
        concat(col("c_custkey"), lit(":"), col("c_name")).as("custkey_name"),
        when(col("c_acctbal") > 0, "positive").otherwise("non_positive").as("balance_status"))
      .orderBy("custkey_name")
  }
}
