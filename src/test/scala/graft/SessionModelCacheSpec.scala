package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger
import graft.core.ModelCache
import graft.operators.{Clustering, TextAnalysis}

/** The session model memo (ModelCache): a production session running
  * many queries against one corpus must fit each driver-held model
  * (BPE merges, BM25 stats, unigram LM, k-means centroids) ONCE —
  * re-invocations of the model-backed gates build their plans with
  * ZERO Spark jobs, because the only job-running step of plan
  * construction is the fit. Staleness: a rewritten corpus refits. */
class SessionModelCacheSpec extends SparkSpec {

  /** Count jobs started while `body` runs: attach a listener, run,
    * then poll until the async listener bus settles (stable count for
    * 200 ms, 3 s cap). */
  private def jobsDuring[T](body: => T): (T, Int) = {
    val n = new AtomicInteger(0)
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the parquet source's file-listing/schema job ("parquet at
        // Tables.scala") is read SETUP — every plan build may pay it,
        // memoized or not; the memo's claim is about TRAINING jobs
        val names = j.stageInfos.map(_.name)
        if (!names.forall(_.startsWith("parquet at "))) {
          n.incrementAndGet()
          descs.add(names.mkString(";"))
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val out = body
      var last = -1
      var stableSince = System.nanoTime()
      val deadline = System.nanoTime() + 3_000_000_000L
      while (System.nanoTime() < deadline &&
             System.nanoTime() - stableSince < 200_000_000L) {
        val cur = n.get()
        if (cur != last) { last = cur; stableSince = System.nanoTime() }
        Thread.sleep(10)
      }
      if (!descs.isEmpty) info(s"jobs: ${descs.toArray.mkString(" | ")}")
      (out, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("second plan build of every model-backed gate refits nothing and runs zero jobs") {
    ModelCache.invalidateSession(spark)
    val gates: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "text_bpe_apply" -> (() => TextAnalysis.qTextBpeApply(spark, sf)),
      "text_bm25" -> (() => TextAnalysis.qTextBm25(spark, sf)),
      "text_unigram_logprob" ->
        (() => TextAnalysis.qTextUnigramLogprob(spark, sf)),
      "emb_kmeans" -> (() => Clustering.qEmbKmeans(spark, sf)))
    for ((name, gate) <- gates) {
      val b0 = ModelCache.builds.get()
      val (first, _) = jobsDuring(gate().collect().toSeq)
      val fits = ModelCache.builds.get() - b0
      assert(fits >= 1, s"$name: first invocation must fit its model")
      // second invocation: same session, same corpus — plan build
      // must touch the memo only (no fit, no job), and the executed
      // result must be identical
      val ((second, jobs2), plan2) = {
        val (df2, j) = jobsDuring(gate())
        ((df2.collect().toSeq, j), df2)
      }
      assert(ModelCache.builds.get() - b0 == fits,
        s"$name: second invocation refit the model")
      assert(jobs2 == 0, s"$name: second plan build ran $jobs2 jobs")
      assert(second == first, s"$name: memoized result diverged")
    }
  }

  test("a rewritten corpus invalidates the memo by fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("mc").toString
    def writeDocs(texts: Seq[String]): Unit = {
      import spark.implicits._
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, "s", "en", t) }
        .toDF("doc_id", "source", "lang", "text")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    }
    writeDocs(Seq("alpha beta", "beta gamma"))
    val s1 = TextAnalysis.qTextBm25(spark, dir).collect()
    val b1 = ModelCache.builds.get()
    // same files -> warm memo
    TextAnalysis.qTextBm25(spark, dir)
    assert(ModelCache.builds.get() == b1, "unchanged corpus refit")
    // rewrite -> the fingerprint (name/len/mtime of data files)
    // changes and the next read refits against the new corpus
    writeDocs(Seq("spark spark spark table", "query table"))
    val s2 = TextAnalysis.qTextBm25(spark, dir).collect()
    assert(ModelCache.builds.get() > b1, "rewritten corpus did not refit")
    assert(!java.util.Arrays.deepEquals(
      s1.asInstanceOf[Array[AnyRef]], s2.asInstanceOf[Array[AnyRef]]),
      "refit model should score the new corpus differently")
  }
}
