package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Executes the claim in [[graft.operators.Sessions.qSessionWindow]]'s
  * scaladoc: the same `session_window` expression runs incrementally
  * under Structured Streaming — sessions merge across micro-batches
  * and emit exactly once (append mode) when the watermark passes
  * them. Parity oracle: the identical aggregation run as one batch
  * over the same rows.
  */
class SessionWindowStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = "1800 seconds"

  private def sessionsOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), Gap))
      .agg(
        min("ts_sec").as("start_sec"),
        (max("ts_sec") - min("ts_sec")).as("visit_length"),
        count(lit(1)).as("step_length"))
      .select("user_id", "start_sec", "visit_length", "step_length")

  test("session_window merges across micro-batches and matches the batch result") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, ts_sec)
    val events = input.toDF().toDF("user_id", "ts_sec")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withWatermark("ts", "10 seconds")
    val q = sessionsOf(events)
      .writeStream.format("memory").queryName("sw_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val t0 = 1700000000L
      // batch 1: user 1 opens a session; user 2 opens one
      input.addData((1L, t0), (1L, t0 + 100), (2L, t0 + 50))
      q.processAllAvailable()
      // batch 2: user 1's session EXTENDS across the batch boundary
      // (diff 1800 = the measured closed-boundary merge), then a gap
      // opens a second session; user 2 is untouched
      input.addData((1L, t0 + 1900), (1L, t0 + 9000))
      q.processAllAvailable()
      // nothing final yet: watermark hasn't passed any session's end
      // (rows may be buffered in state, not emitted)
      // flusher: far-future event advances the watermark past all ends
      input.addData((999L, t0 + 100000))
      q.processAllAvailable()

      val streamed = spark.table("sw_stream")
        .where($"user_id" =!= 999L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val batch = sessionsOf(
        Seq((1L, t0), (1L, t0 + 100), (2L, t0 + 50),
            (1L, t0 + 1900), (1L, t0 + 9000))
          .toDF("user_id", "ts_sec")
          .withColumn("ts", timestamp_seconds(col("ts_sec"))))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the cross-batch merge really happened: user 1's first session
      // spans t0..t0+1900 (3 events), not split at the batch boundary
      assert(streamed.contains((1L, t0, 1900L, 3L)), streamed)
      // and the gap split still happened inside the stream
      assert(streamed.contains((1L, t0 + 9000, 0L, 1L)), streamed)
      assert(streamed.contains((2L, t0 + 50, 0L, 1L)), streamed)
    } finally q.stop()
  }
}
