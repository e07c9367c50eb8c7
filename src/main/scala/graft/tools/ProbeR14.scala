package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 phase-level profiling probes — times sub-plans of the
  * heavy queries with the noop sink (guide §1.4) so the expensive
  * stage inside a composition is identified by measurement, not by
  * reading. Not part of the driver contract; numbers land in
  * OPTIMIZATION_r14.md. Usage:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProbeR14 <probe> [reps]"
  */
object ProbeR14 {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      // one warmup, then reps timed — median printed
      body
      spark.catalog.clearCache(); System.gc()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        t
      }
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"[probe] $label%-40s med=$med%7.3f reps=${ts.map(x => f"$x%.2f").mkString(",")}")
    }

    probe match {
      case "prefpairs" => probePrefPairs(spark, sfDir, time)
      case "streamwm2" => probeStreamWatermarkPhases(spark, sfDir)
      case "contain"   => probeContainment(spark, sfDir, time)
      case "misc2"     => probeMisc2(spark, sfDir, time)
      case "lsh"       => probeLsh(spark, sfDir, time)
      case "streamwm"  => probeStreamWatermark(spark, sfDir, time)
      case "pretrain"  => probePretrain(spark, sfDir, time)
      case other       => System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }

  /** eval_preference_pairs phase split: panel build / F1 scoring /
    * rank windows + final agg. */
  private def probePrefPairs(spark: SparkSession, dir: String,
                             time: String => (=> Unit) => Unit): Unit = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    def panel = docs.select(col("doc_id").as("prompt_id"),
        col("text").as("ref"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("r"))
      .withColumn("cand_id", col("prompt_id") + col("r"))
      .join(docs.select(col("doc_id").as("cand_id"),
        col("text").as("pred")), "cand_id")
      .select("prompt_id", "cand_id", "pred", "ref")
    time("panel only")(noop(panel))
    time("panel + withF1")(noop(graft.operators.EvalScoring.withF1(panel)))
    time("panel + withF1 (3 cols)")(noop(
      graft.operators.EvalScoring.withF1(panel)
        .select("prompt_id", "cand_id", "token_f1")))
    time("full qPreferencePairs")(noop(
      graft.operators.EvalScoring.qPreferencePairs(spark, dir)))
    time("full incl count action")(
      { graft.operators.EvalScoring.qPreferencePairs(spark, dir).count(); () })
  }

  /** LSH kernel phase split: signatures / band-join candidates /
    * verified pairs. */
  private def probeLsh(spark: SparkSession, dir: String,
                       time: String => (=> Unit) => Unit): Unit = {
    val docs = graft.Tables.documents(spark, dir)
    time("shingles explode only")(noop(
      docs.select(col("doc_id"),
        explode(graft.functions.Text.shingles3(col("text"))).as("sh"))))
    time("signaturesOf")(noop(graft.operators.Dedup.signaturesOf(docs)))
    time("band-join candidates (sig cached)") {
      val sigs = graft.operators.Dedup.signaturesOf(docs).cache()
      sigs.count()
      val bands = sigs.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_id", "bucket")))
      noop(bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct())
      sigs.unpersist()
    }
    time("full qDedupMinhashLsh count")(
      { graft.operators.Dedup.qDedupMinhashLsh(spark, dir).count(); () })
  }

  /** stream_dedup_watermark phase split: feed collect / replay loop /
    * final local sort. */
  private def probeStreamWatermark(spark: SparkSession, dir: String,
                                   time: String => (=> Unit) => Unit): Unit = {
    import spark.implicits._
    time("feed orderBy+collect") {
      graft.Tables.eventsNorm(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts_sec"))
        .orderBy("ts_sec", "user_id", "event_type")
        .as[(Long, String, Long)].collect()
      ()
    }
    time("full qStreamDedupWatermark count")(
      { graft.streaming.StreamReplays.qStreamDedupWatermark(spark, dir)
          .count(); () })
  }

  /** dedup_containment / dedup_ngram_jaccard phase split: candidate
    * generation (prefix machinery) vs exact verify. */
  private def probeContainment(spark: SparkSession, dir: String,
                               time: String => (=> Unit) => Unit): Unit = {
    val docs = graft.Tables.documents(spark, dir)
    val cands = graft.operators.Dedup.containmentCandidates(docs)
    time("containment candidates only")(noop(cands))
    println(s"[probe] containment candidate pairs: ${cands.count()}")
    time("containment full")(
      { graft.operators.Dedup.qDedupContainment(spark, dir).count(); () })
    time("ngram_jaccard full")(
      { graft.operators.Dedup.qDedupNgramJaccard(spark, dir).count(); () })
  }

  /** Misc wave-2 targets: classifier gate cost, source overlap,
    * verbatim, mutual-knn. */
  private def probeMisc2(spark: SparkSession, dir: String,
                         time: String => (=> Unit) => Unit): Unit = {
    val docs = graft.Tables.documents(spark, dir)
    time("classifier gate scan")(noop(
      graft.operators.TextAnalysis.qualityClassifier(docs)))
    time("source_overlap full")(
      { graft.operators.TextAnalysis.qSourceOverlap(spark, dir).count(); () })
    time("verbatim coverage full")(
      { graft.operators.Dedup.qVerbatimCoverage(spark, dir).count(); () })
    time("mutual_knn full")(
      { graft.operators.Similarity.qSimMutualKnnClusters(spark, dir).count(); () })
    time("overlap_kmv full")(
      { graft.operators.TextAnalysis.qTextOverlapKmv(spark, dir).count(); () })
    time("csv_explode full")(
      { graft.operators.Scalars.qCsvExplode(spark, dir).count(); () })
    time("stratified_sample full")(
      { graft.operators.ParamFilters.qStratifiedSample(spark, dir).count(); () })
    time("skipgram_pmi full")(
      { graft.operators.TextAnalysis.qSkipgramPmi(spark, dir).count(); () })
  }

  /** Per-chunk wall times inside the watermark-dedup replay, plus a
    * no-op stateless control replay to separate micro-batch fixed
    * costs from the state-store work. */
  private def probeStreamWatermarkPhases(spark: SparkSession,
                                         dir: String): Unit = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val feed = graft.Tables.eventsNorm(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_sec"))
      .orderBy("ts_sec", "user_id", "event_type")
      .as[(Long, String, Long)].collect().toSeq
    val passes = feed ++ feed
    println(s"[probe] feed rows: ${feed.size}, passes: ${passes.size}")

    def replay(label: String)(mk: DataFrame => DataFrame): Unit = {
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val out = scala.collection.mutable.ArrayBuffer[Long]()
        val input = MemoryStream[(Long, String, Long)]
        val q = mk(input.toDF().toDF("user_id", "event_type", "ts_sec"))
          .writeStream
          .outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val n = batch.count()
            out.synchronized { out += n }
            ()
          }
          .start()
        val t1 = System.nanoTime()
        try {
          passes.grouped(math.max(1, (passes.size + 5) / 6))
            .foreach { chunk =>
              val ta = System.nanoTime()
              input.addData(chunk)
              val tb = System.nanoTime()
              q.processAllAvailable()
              val tc = System.nanoTime()
              println(f"[probe] $label rep$rep chunk: add=${(tb - ta) / 1e9}%.2f proc=${(tc - tb) / 1e9}%.2f")
            }
        } finally q.stop()
        println(f"[probe] $label rep$rep TOTAL=${(System.nanoTime() - t0) / 1e9}%.2f (start=${(t1 - t0) / 1e9}%.2f) batches=${out.size}")
      }
    }

    replay("stateless-control")(df => df.select("user_id", "event_type"))
    replay("watermark-dedup")(df => df
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))
      .withWatermark("event_time", "4000 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type"))
  }

  /** pipeline_pretrain_model phase split vs pipeline_pretrain_corpus. */
  private def probePretrain(spark: SparkSession, dir: String,
                            time: String => (=> Unit) => Unit): Unit = {
    time("pretrain_corpus count")(
      { graft.operators.Pipeline.qPretrainCorpus(spark, dir).count(); () })
    time("pretrain_model count")(
      { graft.operators.Pipeline.qPretrainCorpusModel(spark, dir).count(); () })
  }
}
