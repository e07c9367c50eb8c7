package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamJoins

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("streaming dedup drops replayed ids across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (event_id, sec)
    val events = input.toDF().toDF("event_id", "sec")
      .withColumn("event_time", timestamp_seconds(col("sec")))
    val q = StreamJoins.dedupEvents(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 100L), (2L, 101L), (1L, 100L)) // dup in-batch
      q.processAllAvailable()
      input.addData((2L, 101L), (3L, 102L)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Long)]   // (ad_id, user, imp_sec)
    val clicks = MemoryStream[(Long, Long, Long)] // (ad_id, user, click_sec)
    val impDf = imps.toDF().toDF("ad_id", "user_id", "imp_sec")
      .withColumn("imp_time", timestamp_seconds(col("imp_sec")))
    val clickDf = clicks.toDF().toDF("ad_id", "user_id", "click_sec")
      .withColumn("click_time", timestamp_seconds(col("click_sec")))
    val q = StreamJoins.attributeClicks(impDf, clickDf)
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      imps.addData((7L, 42L, 1000L))
      clicks.addData(
        (7L, 42L, 1500L),   // same ad+user within 1h → attributed
        (7L, 42L, 999L),    // before the impression → no
        (7L, 42L, 1000L + 3601L), // past the window → no
        (7L, 99L, 1500L),   // different user → no
        (8L, 42L, 1500L))   // different ad → no
      q.processAllAvailable()
      val got = spark.table("attrib_out")
        .select("ad_id", "user_id").as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 42L)))
    } finally q.stop()
  }

  test("batch mode: same transforms run without watermarks") {
    val imps = Seq((7L, 42L, ts(1000))).toDF("ad_id", "user_id", "imp_time")
    val clicks = Seq((7L, 42L, ts(1500)), (7L, 42L, ts(9999)))
      .toDF("ad_id", "user_id", "click_time")
    val got = StreamJoins.attributeClicks(imps, clicks)
      .select("click_time").as[java.sql.Timestamp].collect().toSeq
    assert(got == Seq(ts(1500)))
  }
}
