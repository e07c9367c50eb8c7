package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Continuous ingestion hygiene: a stream of incoming training
  * documents checked for benchmark contamination from `foreachBatch`
  * against a standing eval-shingle store computed ONCE (the
  * decontamination twin of StreamingIncrementalDedupSpec). The
  * compositionality claim is asserted directly: per-micro-batch
  * results unioned over the run equal the one-shot batch gate,
  * because per-doc shared-shingle counts never cross batches.
  */
class StreamingDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch decontamination composes across micro-batches") {
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val w = 4
    // eval-shingle store: computed once, lives across micro-batches
    val evalSh = TextAnalysis.shingleSet(
        docs.where(col("doc_id") % 20 === 0), w)
      .select("sh").distinct().cache()
    evalSh.count()

    val trainDocs = docs.where(col("doc_id") % 20 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()

    val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        TextAnalysis.decontaminateAgainst(
            evalSh, TextAnalysis.shingleSet(batch, w))
          .collect()
          .foreach(r => flagged.add((r.getLong(0), r.getLong(1))))
      }
      .start()
    try {
      val (first, rest) = trainDocs.splitAt(trainDocs.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(rest.toSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = flagged.toArray(Array.empty[(Long, Long)]).toSet
    val oneShot = TextAnalysis.qDecontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot,
      s"only-streamed=${streamed.diff(oneShot).take(3)} only-batch=${oneShot.diff(streamed).take(3)}")
    assert(streamed.nonEmpty, "fixture has no contaminated train docs")
    evalSh.unpersist()
  }
}
