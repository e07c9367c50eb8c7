package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sessionization + session analytics over the `events` stream table —
  * the Spark-first re-expression of the reference's session job
  * (reference: spark/session/UserVisitSessionAnalyzeSpark.java).
  *
  * The reference's data carries a pre-assigned `session_id`; our
  * events table doesn't, so we sessionize the standard way: a gap
  * cutoff per user (lag + running sum of session starts), which is
  * strictly more general. All stats that the reference computed with
  * a custom string-packed accumulator
  * (SessionAggrStatAccumulator.java:18-90) become a single
  * conditional-aggregation pass.
  *
  * Scale notes: one shuffle on user_id for the window, then the
  * groupBy(user_id, session_idx) reuses the same partitioning (no
  * second exchange — user_id is a prefix of the group keys). At
  * 100 TB the window state per user is bounded by that user's events;
  * skewed power-users are handled by AQE.
  */
object Sessions {

  val SessionGapSeconds = 1800L

  /** Per-user gap-based session assignment. */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsNorm(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.withColumn("prev_sec", lag("ts_sec", 1).over(w))
      .withColumn("is_new",
        when(col("prev_sec").isNull ||
             col("ts_sec") - col("prev_sec") > SessionGapSeconds, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Session roll-up: one row per (user, session) with visit/step
    * length (reference fold: UserVisitSessionAnalyzeSpark.java:304-421
    * — max(time)-min(time), count, min(time)). */
  def qSessionize(spark: SparkSession, dir: String): DataFrame =
    sessionized(spark, dir)
      .groupBy("user_id", "session_idx")
      .agg(
        min("ts_sec").as("start_sec"),
        (max("ts_sec") - min("ts_sec")).as("visit_length"),
        count(lit(1)).as("step_length"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .orderBy("user_id", "session_idx")

  /** Sessionization via Spark's NATIVE `session_window` merging
    * aggregation — the same sessions as [[qSessionize]], computed by
    * the built-in operator instead of lag + cumsum. Boundary
    * semantics: session_window merges on half-open intervals (merge
    * iff gap ≤ duration — measured here: 1801 s merged one more pair
    * than the lag form, 1800 s matches it exactly), same as the lag
    * formulation's `> 1800` starts-a-session rule on whole-second
    * timestamps. No per-user ordinal exists here, so sessions key on
    * their start time instead of session_idx. Why carry both forms:
    * session_window is the expression that ALSO runs incrementally
    * under Structured Streaming with a watermark (state = open
    * sessions, merged on arrival), so batch and stream share one
    * sessionization definition; the lag form exists for engines and
    * oracles without merging windows. One shuffle on user_id, like
    * qSessionize. */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsNorm(spark, dir)
      .groupBy(col("user_id"),
        session_window(timestamp_seconds(col("ts_sec")), "1800 seconds"))
      .agg(
        min("ts_sec").as("start_sec"),
        (max("ts_sec") - min("ts_sec")).as("visit_length"),
        count(lit(1)).as("step_length"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .select("user_id", "start_sec", "visit_length", "step_length", "purchases")
      .orderBy("user_id", "start_sec")

  /** Whole-population session stats: bucketed visit-length /
    * step-length ratios in ONE conditional-agg row — replaces the
    * reference's custom accumulator + driver-side ratio math
    * (UserVisitSessionAnalyzeSpark.java:1021-1114). Ratios 2-decimal
    * HALF_UP like util/NumberUtils.java:16-19. */
  def qSessionStats(spark: SparkSession, dir: String): DataFrame = {
    val sessions = qSessionize(spark, dir)
    def ratio(cond: Column): Column =
      graft.functions.Text.roundPortable(
        sum(when(cond, 1).otherwise(0)) / count(lit(1)), 2)
    sessions.agg(
      count(lit(1)).as("session_count"),
      ratio(col("visit_length") <= 60).as("visit_1m"),
      ratio(col("visit_length") > 60 && col("visit_length") <= 600).as("visit_1m_10m"),
      ratio(col("visit_length") > 600 && col("visit_length") <= 1800).as("visit_10m_30m"),
      ratio(col("visit_length") > 1800).as("visit_30m_plus"),
      ratio(col("step_length") <= 3).as("step_1_3"),
      ratio(col("step_length") > 3 && col("step_length") <= 9).as("step_4_9"),
      ratio(col("step_length") > 9).as("step_10_plus"))
  }

  /** Ordered funnel: sessions that contain view → click → purchase in
    * that temporal order, with stage conversion rates. Stage k's
    * timestamp is the earliest matching event after stage k-1.
    * ONE aggregation pass over the sessionized events: the per-session
    * event list is collected in the same groupBy that computes the
    * first-view timestamp (session lengths bound the list), and the
    * click/purchase stage timestamps are array folds over it — no
    * joins, no recomputed window lineage. The groupBy keys extend the
    * sessionize window's user_id partitioning, so there is exactly one
    * shuffle in the whole query. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val s = sessionized(spark, dir)
      .select("user_id", "session_idx", "ts_sec", "event_type")
    val perSession = s.groupBy("user_id", "session_idx")
      .agg(
        min(when(col("event_type") === "view", col("ts_sec"))).as("v_sec"),
        collect_list(struct(col("ts_sec"), col("event_type"))).as("evs"))
      // a null v_sec/c_sec nulls the comparison → filter drops the
      // row → array_min(empty) = null: exactly the stage-gating the
      // join formulation expressed
      .withColumn("c_sec", array_min(expr(
        "transform(filter(evs, e -> e.event_type = 'click' AND e.ts_sec > v_sec), e -> e.ts_sec)")))
      .withColumn("p_sec", array_min(expr(
        "transform(filter(evs, e -> e.event_type = 'purchase' AND e.ts_sec > c_sec), e -> e.ts_sec)")))
    perSession.agg(
      count(lit(1)).as("n_sessions"),
      count(col("v_sec")).as("n_view"),
      count(col("c_sec")).as("n_view_click"),
      count(col("p_sec")).as("n_view_click_purchase"),
      graft.functions.Text.roundPortable(
        count(col("c_sec")) / count(col("v_sec")).cast("double"), 4).as("rate_click"),
      graft.functions.Text.roundPortable(
        count(col("p_sec")) / count(col("c_sec")).cast("double"), 4).as("rate_purchase"))
  }

  /** Page single-hop conversion rate (reference: PageOneStepConvert
    * RateSpark.java — in-group sort + adjacent pairing at 159-217,
    * driver-side chained rates at 270-308). Spark-first: lag() window
    * for adjacency, then the rate chain is itself a lag() over the
    * per-split counts — fully distributed, no driver loop.
    * Flow: view → click → purchase. rate(split_i) =
    * pv(split_i) / pv(split_{i-1}), first split vs start-page PV. */
  def qPageConvertRate(spark: SparkSession, dir: String): DataFrame = {
    val flow = Seq("view", "click", "purchase")
    val splits = flow.zip(flow.tail).map { case (a, b) => s"${a}_$b" }
    val posDf = {
      import spark.implicits._
      splits.zipWithIndex.map { case (s, i) => (s, i + 1) }.toDF("split", "pos")
    }
    val e = Tables.eventsNorm(spark, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = e
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNotNull)
      .select(concat(col("prev_type"), lit("_"), col("event_type")).as("split"))
    val pairCounts = pairs.join(broadcast(posDf), "split")
      .groupBy("split", "pos").agg(count(lit(1)).as("pv"))
    val startPv = e.where(col("event_type") === flow.head)
      .agg(count(lit(1)).as("start_pv"))
    val wOrd = Window.orderBy("pos") // #splits rows — single tiny partition is fine
    pairCounts.crossJoin(startPv)
      .withColumn("prev_pv", coalesce(lag("pv", 1).over(wOrd), col("start_pv")))
      .select(col("split"), col("pv"),
              graft.functions.Text.roundPortable(
                col("pv") / col("prev_pv"), 4).as("convert_rate"))
      .orderBy("split")
  }

  /** NEXT-EVENT SEQUENCE EXAMPLES — supervised training pairs built
    * from event history: for every event with ≥ 3 predecessors in
    * its user's timeline, (context = the previous 3 event types in
    * order, target = this event's type). This is the sequence-model
    * training-data constructor (session-recommendation / next-action
    * prediction) — the event-log analog of what [[graft.operators.TextAnalysis]]'s
    * chunker does for documents: raw logs in, fixed-shape examples
    * out. Short histories are DROPPED, not padded — a padded prefix
    * teaches the model the pad token; the first 3 events per user
    * are context for later examples, never examples themselves.
    *
    * Scale shape: one user_id shuffle for the ordered window — the
    * same single exchange every sessionization here pays (and lag
    * windows never materialize the whole user history per row; state
    * is the 3-row frame tail). */
  def qSequenceExamples(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.eventsNorm(spark, dir)
      .withColumn("h1", lag("event_type", 1).over(w))
      .withColumn("h2", lag("event_type", 2).over(w))
      .withColumn("h3", lag("event_type", 3).over(w))
      .where(col("h3").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_sec"),
        concat_ws(" ", col("h3"), col("h2"), col("h1")).as("context"),
        col("event_type").as("target"))
      .orderBy("user_id", "event_id")
  }
}
