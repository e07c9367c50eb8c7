package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GroupConcatDistinct

/** "Area top-3 hot products" (reference: spark/product/
  * AreaTop3ProductSpark.java) re-expressed over the TPC-H-ish star
  * schema: region plays `area`, part plays `product`, lineitem plays
  * the click fact, nation plays `city`. One declarative plan replaces
  * the reference's temp-table-per-stage chain
  * (AreaTop3ProductSpark.java:296,357,510): Catalyst sees the whole
  * pipeline, so column pruning and join reordering span all stages.
  *
  * Scale notes: nation/region/supplier are broadcast (dims); the only
  * shuffles are the fact-side groupBy(region, part) and the
  * per-region window. The window input is already one row per
  * (region, part) — tiny compared to the fact — so rank ≤ 3 costs
  * nothing at 100 TB.
  */
object AreaTop3 {

  /** Full job: per-region top-3 parts by line count, with the
    * distinct-nation roll-up (reference's group_concat_distinct UDAF,
    * GroupConcatDistinctUDAF.java) and the CASE-based area level
    * (AreaTop3ProductSpark.java:384-397). */
  def qAreaTop3(spark: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(spark, dir).select("l_suppkey", "l_partkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_regionkey", "n_name")
    val reg = Tables.region(spark, dir)
    val prt = Tables.part(spark, dir).select("p_partkey", "p_name")

    val fact = li
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))

    val counts = fact
      .groupBy(col("r_name").as("area"), col("l_partkey").as("product_id"))
      .agg(count(lit(1)).as("click_count"),
           GroupConcatDistinct(col("n_name")).as("nation_names"))

    val w = Window.partitionBy("area")
      .orderBy(desc("click_count"), col("product_id"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .join(broadcast(prt), counts("product_id") === prt("p_partkey"))
      .select(
        col("area"),
        when(col("area").isin("AMERICA", "ASIA"), "A Level")
          .when(col("area").isin("EUROPE"), "B Level")
          .when(col("area").isin("AFRICA"), "C Level")
          .otherwise("D Level").as("area_level"),
        col("product_id"), col("p_name").as("product_name"),
        col("click_count"), col("nation_names"), col("rank"))
      .orderBy("area", "rank")
  }

  /** Grouped top-N through the custom [[graft.plans.GroupedTopK]]
    * physical operator (bounded per-key heaps, partial → shuffle →
    * final; no per-group sort) — same semantics as [[qWindowTopN]],
    * which the oracle asserts. */
  def qGroupedTopKCustom(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GroupedTopKApi.groupedTopK(
        Tables.orders(spark, dir),
        keys = Seq("o_orderpriority"), order = "o_totalprice",
        tie = "o_orderkey", k = 3)
      .select(col("o_orderpriority"), col("o_orderkey"),
              graft.functions.Text.roundPortable(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Grouped top-N via row_number (reference: RowNumberWindowFunction
    * .java:31-43 demo; AdClickRealTimeSpark.java:643-659 province
    * top-3, whose `WHERE rank>=3` is a reference bug — we implement
    * the documented intent `<=3`). */
  def qWindowTopN(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
              graft.functions.Text.roundPortable(col("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority", "rank")
  }
}
