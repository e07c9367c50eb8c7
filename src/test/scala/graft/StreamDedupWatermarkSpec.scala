package graft

import org.apache.spark.sql.functions._

/** Engine-primitive streaming dedup (stream_dedup_watermark): the
  * oracle gate pins the rows; this spec pins what the replay is
  * claiming — a twice-replayed feed (every row an exact duplicate,
  * spread across micro-batches) collapses to the batch-distinct key
  * set, with no key emitted twice.
  */
class StreamDedupWatermarkSpec extends SparkSpec {

  test("twice-replayed feed collapses to batch distinct, no key emitted twice") {
    val got = graft.streaming.StreamReplays.qStreamDedupWatermark(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // no duplicates in the emitted stream
    assert(got.length == got.toSet.size)
    val expected = Tables.eventsNorm(spark, sf)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == expected)
  }
}
