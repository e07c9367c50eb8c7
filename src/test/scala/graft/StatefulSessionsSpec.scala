package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{SessionEvent, SessionOut}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("watermark timeout closes idle sessions; in-batch gaps split sessions") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withTime = input.toDS()
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))
      .withWatermark("event_time", "0 seconds")
      .as[SessionEvent]
    val q = StatefulSessions.sessionize(withTime, gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: one open session for user 1 (two events 100s apart)
      input.addData(SessionEvent(1L, 1000L, "view"),
                    SessionEvent(1L, 1100L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("sessions_out").isEmpty) // still open

      // batch 2: a far-future event for user 2 pushes the watermark
      // past 1100 + 1800 → user 1's session times out and is emitted
      input.addData(SessionEvent(2L, 100000L, "view"))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, 200000L, "view")) // advance watermark again
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[SessionOut].collect()
        .sortBy(_.user_id)
      assert(closed.exists(s => s.user_id == 1L && s.visit_length == 100L &&
        s.step_length == 2L && s.purchases == 1L), closed.mkString(","))
      // user 2's first session (single event) closed by the in-batch gap
      // or timeout depending on watermark progression
      assert(closed.count(_.user_id == 2L) <= 1)
    } finally q.stop()
  }

  test("an event behind the watermark does not kill the query") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withTime = input.toDS()
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))
      .withWatermark("event_time", "0 seconds")
      .as[SessionEvent]
    val q = StatefulSessions.sessionize(withTime, gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      // push the watermark far ahead of epoch 1000 + gap
      input.addData(SessionEvent(9L, 200000L, "view"))
      q.processAllAvailable()
      // an event whose session-timeout target (1000+1800)s is far
      // behind the current watermark (200000s): before the clamp in
      // StatefulSessions.stateFn this raised IllegalArgumentException
      // inside setTimeoutTimestamp and killed the whole query
      input.addData(SessionEvent(3L, 1000L, "view"))
      q.processAllAvailable()
      // and the query must still process fresh events afterwards
      input.addData(SessionEvent(9L, 500000L, "view"))
      q.processAllAvailable()
      assert(q.isActive, Option(q.exception).map(_.toString).getOrElse(""))
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    } finally q.stop()
  }

  test("batch-mode stateful sessionizer agrees with the window-based one") {
    val e = graft.Tables.eventsNorm(spark, sf)
      .select(col("user_id"), col("ts_sec"), col("event_type"))
      .as[SessionEvent]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[SessionOut]
    val stateful = e.groupByKey(_.user_id)
      .flatMapGroups { (u, evs) =>
        // run the same state function shape without GroupState: batch
        // reference = sort + gap-split
        val sorted = evs.toSeq.sortBy(_.ts_sec)
        val out = scala.collection.mutable.ListBuffer[SessionOut]()
        var start = -1L; var last = -1L; var steps = 0L; var purch = 0L
        sorted.foreach { ev =>
          if (start < 0) { start = ev.ts_sec; last = ev.ts_sec; steps = 1
            purch = if (ev.event_type == "purchase") 1 else 0 }
          else if (ev.ts_sec - last <= 1800L) { last = ev.ts_sec; steps += 1
            purch += (if (ev.event_type == "purchase") 1 else 0) }
          else { out += SessionOut(u, start, last - start, steps, purch)
            start = ev.ts_sec; last = ev.ts_sec; steps = 1
            purch = if (ev.event_type == "purchase") 1 else 0 }
        }
        if (start >= 0) out += SessionOut(u, start, last - start, steps, purch)
        out.iterator
      }
    val fromWindows = graft.operators.Sessions.qSessionize(spark, sf)
      .select(col("user_id"), col("start_sec"), col("visit_length"),
              col("step_length"), col("purchases"))
      .as[SessionOut]
    val a = stateful.collect().toSet
    val b = fromWindows.collect().toSet
    assert(a == b, s"stateful=${a.size} windows=${b.size} diff=${(a diff b).take(3)}")
  }
}
