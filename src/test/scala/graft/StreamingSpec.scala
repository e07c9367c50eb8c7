package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.AdStream

/** Structured Streaming behavior of the AdStream pipelines driven by
  * MemoryStream micro-batches (replaying the reference's Kafka line
  * format), asserting per-batch state like the reference's MySQL
  * tables would show it. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // reference line format: "timestamp_ms province city userid adid"
  private def line(tsSec: Long, prov: String, city: String, user: Long, ad: Long) =
    s"${tsSec * 1000L} $prov $city $user $ad"

  test("parse extracts typed columns from reference-format lines") {
    val df = Seq(line(1543920000L, "Jiangsu", "Nanjing", 42, 7)).toDF("value")
    val row = AdStream.parse(df).collect().head
    assert(row.getAs[String]("province") == "Jiangsu")
    assert(row.getAs[String]("city") == "Nanjing")
    assert(row.getAs[Long]("user_id") == 42L)
    assert(row.getAs[Long]("ad_id") == 7L)
    assert(row.getAs[java.sql.Timestamp]("event_time").getTime == 1543920000000L)
  }

  test("running stats accumulate across micro-batches (update mode)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = AdStream.runningStats(AdStream.parse(input.toDF()))
      .writeStream.format("memory").queryName("running_stats")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        line(1543920000L, "Jiangsu", "Nanjing", 1, 7),
        line(1543920001L, "Jiangsu", "Nanjing", 2, 7))
      q.processAllAvailable()
      val afterBatch1 = spark.table("running_stats")
        .groupBy("date", "province", "city", "ad_id")
        .max("click_count").collect()
      assert(afterBatch1.length == 1 && afterBatch1.head.getLong(4) == 2L)

      input.addData(line(1543920005L, "Jiangsu", "Nanjing", 3, 7))
      q.processAllAvailable()
      // update mode re-emits the grown count for the same key
      val counts = spark.table("running_stats")
        .groupBy("date", "province", "city", "ad_id")
        .max("click_count").collect()
      assert(counts.length == 1 && counts.head.getLong(4) == 3L)
    } finally q.stop()
  }

  test("blacklist feedback: stream-static anti join drops flagged users") {
    val clicks = AdStream.parse(Seq(
      line(1543920000L, "P", "C", 1, 1),
      line(1543920001L, "P", "C", 1, 1),
      line(1543920002L, "P", "C", 1, 1),
      line(1543920003L, "P", "C", 2, 1)).toDF("value"))
    val bl = AdStream.blacklist(AdStream.dailyUserAdCounts(clicks), 3L)
    assert(bl.as[Long].collect().toSeq == Seq(1L))
    val kept = AdStream.filterBlacklisted(clicks, bl)
      .select("user_id").distinct().as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  test("sliding-window trend assigns each event to window/slide windows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    // 1h window / 30m slide → each event lands in exactly 2 windows
    val q = AdStream.clickTrend(AdStream.parse(input.toDF()),
        windowDur = "1 hour", slide = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("trend")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(line(3600L, "P", "C", 1, 9)) // 01:00:00
      q.processAllAvailable()
      val rows = spark.table("trend")
        .select("window_start", "click_count").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 1L))
      val starts = rows.map(_.getTimestamp(0).getTime / 1000L).sorted.toSeq
      assert(starts == Seq(1800L, 3600L)) // 00:30 and 01:00 windows
    } finally q.stop()
  }

  test("late events behind the watermark are dropped from window aggregates") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = AdStream.clickTrend(AdStream.parse(input.toDF()),
        windowDur = "1 hour", slide = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("trend_late")
      .outputMode("update").start()
    try {
      input.addData(line(10000L, "P", "C", 1, 1))
      q.processAllAvailable()
      input.addData(line(20000L, "P", "C", 1, 1)) // watermark → 10000
      q.processAllAvailable()
      input.addData(line(40000L, "P", "C", 1, 1)) // watermark → 20000
      q.processAllAvailable()
      val before = spark.table("trend_late").count()
      // t=5000 is far behind the 20000s watermark: its windows end
      // ≤ 7200 < 20000, so the event must be silently dropped
      input.addData(line(5000L, "P", "C", 1, 1))
      q.processAllAvailable()
      val after = spark.table("trend_late")
      assert(after.count() == before, "late event was not dropped")
      assert(after.where(col("window_start") < to_timestamp(lit("1970-01-01 01:00:00")))
        .count() == 0)
    } finally q.stop()
  }

  test("province top-3 ranks ads per (date, province) with intent rank<=3") {
    val clicks = AdStream.parse((
      (1 to 5).map(i => line(1543920000L + i, "P1", "C", i, 1)) ++
      (1 to 3).map(i => line(1543920010L + i, "P1", "C", i, 2)) ++
      (1 to 4).map(i => line(1543920020L + i, "P1", "C", i, 3)) ++
      (1 to 2).map(i => line(1543920030L + i, "P1", "C", i, 4)) ++
      Seq(line(1543920040L, "P2", "C", 1, 8))).toDF("value"))
    val top = AdStream.provinceTop3(AdStream.runningStats(clicks))
      .select("province", "ad_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(top == Set(("P1", 1L, 1L), ("P1", 3L, 2L), ("P1", 2L, 3L), ("P2", 8L, 1L)))
  }
}
