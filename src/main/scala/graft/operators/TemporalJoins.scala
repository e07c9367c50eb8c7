package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join surfaces the reference lacks entirely (SURVEY §2.3:
  * "no theta/range/as-of joins anywhere") but a log-analytics engine
  * needs. Both are composed from built-ins per the
  * custom-operator preference order — no custom plan node required:
  * the range join is an equi-join on the entity key plus a range
  * predicate (Spark plans the equi part as the join key and applies
  * the range as a post-join filter; the scale path adds a
  * time-bucket to the equi key), and the as-of join is the
  * union+ordered-window formulation (no per-row subquery, one
  * shuffle on the entity key).
  */
object TemporalJoins {

  /** Range join: for every error event, how many events the same user
    * produced in the preceding 10 minutes. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsNorm(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("event_type"))
    val errors = e.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
              col("ts_sec").as("err_sec"))
    errors.join(e,
        col("err_user") === col("user_id") &&
        col("ts_sec") >= col("err_sec") - 600 &&
        col("ts_sec") < col("err_sec"), "left")
      .groupBy("err_id")
      .agg(count(col("event_id")).as("n_preceding"))
      .orderBy("err_id")
  }

  /** As-of join: for every error event, the most recent preceding
    * click by the same user (union + last_value window — the
    * scalable as-of formulation). */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsNorm(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("last_click_sec",
        last(when(col("event_type") === "click", col("ts_sec")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
              col("last_click_sec"),
              (col("ts_sec") - col("last_click_sec")).as("gap_sec"))
      .orderBy("event_id")
  }
}
