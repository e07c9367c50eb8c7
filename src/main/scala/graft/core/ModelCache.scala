package graft.core

import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Session-scoped memo for driver-held corpus MODELS — the build-once
  * treatment the IVF index and the cluster table already have
  * (catalog tables, fingerprint-invalidated), extended to the model
  * family that lives as driver state instead of a table: BPE merge
  * tables, BM25 corpus statistics, unigram-LM vocabularies, k-means
  * centroids.
  *
  * Why: each of these is derived by one-or-more corpus jobs at PLAN
  * BUILD time (the model collects are eager), and the gates run each
  * query once — but a production session running 100 retrieval
  * queries against the same corpus would re-train the model 100×.
  * With the memo, the second build of the same (session, family,
  * corpus) plan runs ZERO jobs until the result itself is executed
  * (SessionModelCacheSpec pins exactly that with a job listener).
  *
  * Staleness is self-detected, the [[graft.operators.Dedup]]
  * cluster-table convention: every entry stores the corpus
  * [[fingerprint]] it was fit on — a directory listing of
  * (name, length, mtime), no file reads, no jobs — and a corpus
  * rewritten in-session (fixture regeneration, incremental batches)
  * mismatches at next read and refits. Keyed on the session INSTANCE
  * so a new session never sees another session's models. */
object ModelCache {

  private val cache =
    new ConcurrentHashMap[(SparkSession, String, String), (String, AnyRef)]

  /** Number of cache-miss builds since JVM start — observability for
    * the no-retraining specs (not part of the public surface). */
  private[graft] val builds = new AtomicLong(0L)

  /** Content identity of the data files under `path`: MD5 over every
    * file's (name, length, mtime), sorted. A rewrite, compaction, or
    * appended batch in the same path changes it; reading costs one
    * directory walk — no file reads, no Spark job. */
  def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(path))
      .filterNot(_.getName.startsWith("."))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The memoized model for (session, family, corpus path): returns
    * the cached value when its stored fingerprint still matches the
    * path's current one, else runs `build` and stores the result.
    * `family` must encode every dial the fit depends on (e.g.
    * "bpe_merges:3" — two step counts are two models). */
  def corpusModel[T <: AnyRef](spark: SparkSession, family: String,
                               path: String)(build: => T): T = {
    val key = (spark, family, path)
    val fp = fingerprint(path)
    val cur = cache.get(key)
    if (cur != null && cur._1 == fp) cur._2.asInstanceOf[T]
    else {
      builds.incrementAndGet()
      val m = build
      cache.put(key, (fp, m))
      m
    }
  }

  /** Drop every entry for a session (tests; a session teardown). */
  private[graft] def invalidateSession(spark: SparkSession): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }
}
