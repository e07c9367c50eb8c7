package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sources.JdbcUpsertSink
import graft.sources.JdbcUpsertSink.{AnsiDialect, InsertIfAbsent, Overwrite}
import graft.streaming.AdStream

/** The reference's full real-time job, end to end (reference:
  * AdClickRealTimeSpark.java — Kafka ingest at 69-92, blacklist
  * feeder 232-337, blacklist filter 132-224, running stats 453-538,
  * province top-3 553-664, sliding trend 749-812, driver HA 822-874):
  *
  *   file source (replayable Kafka stand-in, same line format)
  *     → blacklist feeder  → Derby `ad_user_click_count` + `blacklist`
  *     → anti-join vs the JDBC blacklist (re-read per micro-batch,
  *       exactly the reference's per-batch MySQL re-read)
  *     → running stats     → Derby `ad_stat`
  *     → per-batch top-3   → Derby `ad_province_top3` (delete+insert)
  *     → sliding trend     → Derby `ad_click_trend`
  *
  * then MORE DATA + RESTART from the same checkpoints, asserting
  * exactly-once file consumption, state-store continuity across the
  * restart (a user crosses the click threshold only when pre- and
  * post-restart clicks are summed), and the blacklist feedback loop
  * (the newly blacklisted user's later clicks vanish from the stats).
  * Derby executes the real MERGE upserts (AnsiDialect). */
class StreamFanoutE2ESpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftfanout;create=true"
  private val Threshold = 3L

  private def exec(sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach(c.createStatement().execute) finally c.close()
  }

  private def queryRows(sql: String)(f: java.sql.ResultSet => Any): List[Any] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      Iterator.continually(rs).takeWhile(_.next()).map(f).toList
    } finally c.close()
  }

  // reference line format: "timestamp_ms province city userid adid"
  private def line(tsSec: Long, prov: String, city: String, user: Long, ad: Long) =
    s"${tsSec * 1000L} $prov $city $user $ad"

  test("file-source fan-out into four Derby tables, with checkpoint restart") {
    val base = Files.createTempDirectory("graft-fanout").toFile
    val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
    def ck(n: String) = new java.io.File(base, s"ck_$n").getAbsolutePath

    def addLines(name: String, lines: Seq[String]): Unit = {
      val tmp = Paths.get(base.getAbsolutePath, s"tmp_$name.txt")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(srcDir.getAbsolutePath, s"$name.txt"),
        StandardCopyOption.ATOMIC_MOVE)
    }

    def clicks(): DataFrame =
      AdStream.parse(spark.readStream.text(srcDir.getAbsolutePath)
        .select(col("value").cast("string")))

    // Derby uppercases unquoted identifiers; read back with the
    // lowercase names the operators expect ("date" is reserved → dt)
    def jdbcTable(table: String, cols: (String, String)*): DataFrame =
      spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
        .select(cols.map { case (from, to) => col(from).as(to) }: _*)

    exec(
      """CREATE TABLE ad_user_click_count (
        |dt DATE NOT NULL, user_id BIGINT NOT NULL, ad_id BIGINT NOT NULL,
        |click_count BIGINT, PRIMARY KEY (dt, user_id, ad_id))""".stripMargin,
      "CREATE TABLE blacklist (user_id BIGINT PRIMARY KEY)",
      """CREATE TABLE ad_stat (
        |dt DATE NOT NULL, province VARCHAR(32) NOT NULL,
        |city VARCHAR(32) NOT NULL, ad_id BIGINT NOT NULL,
        |click_count BIGINT, PRIMARY KEY (dt, province, city, ad_id))""".stripMargin,
      """CREATE TABLE ad_province_top3 (
        |dt DATE NOT NULL, province VARCHAR(32) NOT NULL,
        |ad_id BIGINT NOT NULL, click_count BIGINT, rnk BIGINT)""".stripMargin,
      """CREATE TABLE ad_click_trend (
        |window_start TIMESTAMP NOT NULL, window_end TIMESTAMP NOT NULL,
        |ad_id BIGINT NOT NULL, click_count BIGINT,
        |PRIMARY KEY (window_start, window_end, ad_id))""".stripMargin)

    /** Query 1 — blacklist feeder. Update mode emits the state
      * store's CUMULATIVE per-key count, so Overwrite lands the same
      * table contents as the reference's additive-upsert of per-batch
      * deltas. Threshold crossers become blacklist members. */
    def runFeeder(): Unit = {
      val q = AdStream.dailyUserAdCounts(clicks())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ck("feeder"))
        .foreachBatch { (df: DataFrame, _: Long) =>
          val counts = df.withColumnRenamed("date", "dt")
          JdbcUpsertSink.upsert(counts, url, "ad_user_click_count",
            Seq("dt", "user_id", "ad_id"), Seq("click_count"), Overwrite, AnsiDialect)
          JdbcUpsertSink.upsert(
            counts.where(col("click_count") >= Threshold).select("user_id").distinct(),
            url, "blacklist", Seq("user_id"), Nil, InsertIfAbsent, AnsiDialect)
        }.start()
      q.processAllAvailable(); q.stop()
    }

    /** Queries 2+3 — blacklist-filtered running stats and, per batch,
      * the top-3 recompute over the full stat table (the reference
      * runs SQL over a temp view of the accumulated stats; reading
      * the just-upserted JDBC table is the same shape). The anti-join
      * static side is JDBC, re-scanned every micro-batch. */
    def runStats(): Unit = {
      val bl = jdbcTable("blacklist", "USER_ID" -> "user_id")
      val q = AdStream.runningStats(AdStream.filterBlacklisted(clicks(), bl))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ck("stats"))
        .foreachBatch { (df: DataFrame, _: Long) =>
          val sess = df.sparkSession
          JdbcUpsertSink.upsert(df.withColumnRenamed("date", "dt"), url, "ad_stat",
            Seq("dt", "province", "city", "ad_id"), Seq("click_count"),
            Overwrite, AnsiDialect)
          val stat = sess.read.format("jdbc")
            .option("url", url).option("dbtable", "ad_stat").load()
            .select(col("DT").as("date"), col("PROVINCE").as("province"),
              col("CITY").as("city"), col("AD_ID").as("ad_id"),
              col("CLICK_COUNT").as("click_count"))
          val top3 = AdStream.provinceTop3(stat)
            .select(col("date").as("dt"), col("province"), col("ad_id"),
              col("click_count"), col("rank").as("rnk"))
          // reference semantics: replace each (dt, province) group
          val keys = top3.select("dt", "province").distinct().collect()
          val c = DriverManager.getConnection(url)
          try {
            val del = c.prepareStatement(
              JdbcUpsertSink.deleteSql("ad_province_top3", Seq("dt", "province")))
            keys.foreach { k =>
              del.setObject(1, k.getAs[Any]("dt"))
              del.setObject(2, k.getAs[Any]("province"))
              del.executeUpdate()
            }
          } finally c.close()
          JdbcUpsertSink.insert(top3, url, "ad_province_top3",
            Seq("dt", "province", "ad_id", "click_count", "rnk"))
        }.start()
      q.processAllAvailable(); q.stop()
    }

    /** Query 4 — sliding trend on the filtered stream. */
    def runTrend(): Unit = {
      val bl = jdbcTable("blacklist", "USER_ID" -> "user_id")
      val q = AdStream.clickTrend(AdStream.filterBlacklisted(clicks(), bl),
          windowDur = "1 hour", slide = "30 minutes", watermark = "2 hours")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ck("trend"))
        .foreachBatch { (df: DataFrame, _: Long) =>
          JdbcUpsertSink.upsert(df, url, "ad_click_trend",
            Seq("window_start", "window_end", "ad_id"), Seq("click_count"),
            Overwrite, AnsiDialect)
        }.start()
      q.processAllAvailable(); q.stop()
    }

    val t0 = 1543920000L // 2018-12-04 12:00:00 UTC
    // ---- phase 1: user 1 crosses the threshold immediately; user 3
    // stays one click short of it
    addLines("batch1",
      (1 to 3).map(i => line(t0 + i, "P1", "C1", 1, 1)) ++
      Seq(line(t0 + 10, "P1", "C1", 2, 1)) ++
      Seq(line(t0 + 20, "P2", "C2", 3, 2), line(t0 + 21, "P2", "C2", 3, 2)))
    runFeeder()
    assert(queryRows("SELECT user_id FROM blacklist ORDER BY user_id")(_.getLong(1))
      == List(1L))
    runStats()
    // user 1's clicks are gone; users 2 and 3 counted
    assert(queryRows(
      "SELECT province, city, ad_id, click_count FROM ad_stat ORDER BY province")(
      r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      == List(("P1", "C1", 1L, 1L), ("P2", "C2", 2L, 2L)))
    runTrend()

    // ---- phase 2: restart everything from checkpoints with new files.
    // user 3's one extra click must blacklist them ONLY if the feeder's
    // state survived the restart (2 pre-restart + 1 post-restart = 3)
    addLines("batch2",
      Seq(line(t0 + 30, "P2", "C2", 3, 2),   // crosses via carried state
          line(t0 + 31, "P1", "C1", 2, 1),   // legitimate user keeps counting
          line(t0 + 32, "P1", "C1", 1, 1)))  // already-blacklisted user
    runFeeder()
    assert(queryRows("SELECT user_id FROM blacklist ORDER BY user_id")(_.getLong(1))
      == List(1L, 3L), "state continuity across restart should blacklist user 3")
    assert(queryRows(
      "SELECT click_count FROM ad_user_click_count WHERE user_id = 1")(_.getLong(1))
      == List(4L), "exactly-once: 3 + 1, not a replay")

    runStats()
    // user 2 keeps accumulating through the stats state store; user 3's
    // post-blacklist click is filtered, so P2 stays at 2
    assert(queryRows(
      "SELECT province, city, ad_id, click_count FROM ad_stat ORDER BY province")(
      r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      == List(("P1", "C1", 1L, 2L), ("P2", "C2", 2L, 2L)))
    assert(queryRows(
      "SELECT province, ad_id, rnk FROM ad_province_top3 ORDER BY province")(
      r => (r.getString(1), r.getLong(2), r.getLong(3)))
      == List(("P1", 1L, 1L), ("P2", 2L, 1L)))

    runTrend()
    // every filtered click lands in two 1h/30m windows; Overwrite keeps
    // the latest cumulative count per (window, ad)
    val trend = queryRows(
      "SELECT ad_id, click_count FROM ad_click_trend ORDER BY ad_id, window_start")(
      r => (r.getLong(1), r.getLong(2)))
    assert(trend == List((1L, 2L), (1L, 2L), (2L, 2L), (2L, 2L)), trend.toString)

    // exactly-once file consumption: each restarted query committed
    // exactly 2 data micro-batches over the 2 file drops. The
    // watermarked trend query also commits one no-data batch per run
    // to advance the watermark and evict state — 4 offsets total.
    Seq("feeder" -> 2, "stats" -> 2, "trend" -> 4).foreach { case (n, k) =>
      val offsets = new java.io.File(ck(n), "offsets").list().toSeq
        .filterNot(f => f.endsWith(".tmp") || f.endsWith(".crc") || f.startsWith("."))
      assert(offsets.toSet == (0 until k).map(_.toString).toSet, s"$n: $offsets")
    }
  }
}
