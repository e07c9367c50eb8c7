package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.AdStream

/** The foreachBatch upsert path: update-mode micro-batches applied as
  * overwrite-upserts into a keyed store must converge to the same
  * state the reference's MySQL ad_stat table would hold. */
class ForeachBatchSpec extends SparkSpec {
  import spark.implicits._

  test("update-mode batches overwrite-upsert into a keyed store") {
    implicit val ctx = spark.sqlContext
    val store = scala.collection.concurrent.TrieMap[(String, String, String, Long), Long]()
    val input = MemoryStream[String]
    val stats = AdStream.runningStats(AdStream.parse(input.toDF()))
    val q = AdStream.sinkPerBatch(stats, "upsert_test", (batch, _) => {
      batch.collect().foreach { r =>
        store.put((r.getAs[java.sql.Date]("date").toString,
          r.getAs[String]("province"), r.getAs[String]("city"),
          r.getAs[Long]("ad_id")), r.getAs[Long]("click_count"))
      }
    })
    def line(tsSec: Long, prov: String, user: Long, ad: Long) =
      s"${tsSec * 1000L} $prov C $user $ad"
    try {
      input.addData(line(1543920000L, "P1", 1, 7), line(1543920001L, "P1", 2, 7))
      q.processAllAvailable()
      assert(store(("2018-12-04", "P1", "C", 7L)) == 2L)
      input.addData(line(1543920002L, "P1", 3, 7), line(1543920003L, "P2", 1, 9))
      q.processAllAvailable()
      // overwrite upsert: P1 key replaced with grown total, P2 added
      assert(store(("2018-12-04", "P1", "C", 7L)) == 3L)
      assert(store(("2018-12-04", "P2", "C", 9L)) == 1L)
    } finally q.stop()
  }
}
