package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Continuous curation: a stream of incoming documents deduped
  * against a standing corpus from `foreachBatch`, reusing the batch
  * [[Dedup.incrementalNearDupSigs]] operator against corpus
  * signatures computed ONCE (the production signature store). The
  * compositionality claim is asserted directly: per-micro-batch
  * results unioned over the run equal one batch invocation over all
  * streamed documents — no batch-batch pairs exist by construction.
  */
class StreamingIncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch incremental dedup composes across micro-batches") {
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val streamDocs = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(streamDocs.length > 100, s"fixture too small: ${streamDocs.length}")

    // signature store: computed once, lives across every micro-batch
    val corpusSigs = Dedup.signaturesOf(corpus).cache()
    corpusSigs.count()

    val flagged =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.incrementalNearDupSigs(corpusSigs, batch)
          .collect()
          .foreach(r => flagged.add((r.getAs[Long]("b_id"),
            r.getAs[Long]("dup_of"), r.getAs[Long]("n_matches"))))
      }
      .start()
    try {
      val (first, rest) = streamDocs.splitAt(streamDocs.length / 2)
      input.addData(first.toSeq); q.processAllAvailable()
      input.addData(rest.toSeq); q.processAllAvailable()
    } finally q.stop()

    val streamed = flagged.toArray(Array.empty[(Long, Long, Long)]).toSet
    val oneShot = Dedup.incrementalNearDupSigs(
        corpusSigs, streamDocs.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getAs[Long]("b_id"), r.getAs[Long]("dup_of"),
        r.getAs[Long]("n_matches"))).toSet
    assert(streamed == oneShot,
      s"only-streamed=${streamed.diff(oneShot)} only-batch=${oneShot.diff(streamed)}")
    assert(streamed.nonEmpty, "fixture contains no cross-parity near-dups")
    corpusSigs.unpersist()
  }

  test("per-batch signature caches are released; the corpus cache survives") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val batch = docs.where(pmod(col("doc_id"), lit(2)) === 1).limit(50)
    spark.catalog.clearCache()
    val corpusSigs = Dedup.signaturesOf(corpus).cache()
    corpusSigs.count()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Dedup.incrementalNearDupBatch(corpusSigs, batch)(_.collect())
    assert(out != null)
    // a long-running foreachBatch service must not accumulate one
    // cached signature frame per micro-batch — the batch must ADD no
    // persistent RDD (blocking unpersist makes this deterministic).
    // Asserted as a SET difference, not a size equality: under
    // full-suite load the ContextCleaner concurrently reaps OTHER
    // suites' unreferenced caches, so the total count can shrink
    // while this operator behaves perfectly (the r11→r12 flake).
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked batch cache RDDs: $leaked")
    // the standing corpus cache must survive the batch's cleanup
    assert(corpusSigs.storageLevel.useMemory,
      "the corpus cache was dropped")
    corpusSigs.unpersist()
  }
}
