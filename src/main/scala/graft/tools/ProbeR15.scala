package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 measurement probes (guide §1 — measure first). Not part
  * of the driver contract; numbers land in OPTIMIZATION_r15.md.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProbeR15 <probe> [reps]"
  */
object ProbeR15 {

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
      println(f"[probe] $label%-44s med=$med%7.3f reps=${ts.map(x => f"$x%.2f").mkString(",")}")
    }

    probe match {
      case "contdecomp" =>
        // phase-level decomposition of qDedupContainment (guide §1.4)
        import graft.functions.Text
        val docs = graft.Tables.documents(spark, sfDir)
        val sh = docs.select(col("doc_id"), Text.shingles3(col("text")).as("shs"))
          .withColumn("ns", size(col("shs")))
          .select(col("doc_id"), col("ns"), explode(col("shs")).as("sh"))
        time("1 postings explode")(noop(sh))
        time("2 dfreq agg")(noop(sh.groupBy("sh").agg(count(lit(1)).as("df"))))
        val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        val wDoc = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("df", "sh")
        val ranked = sh.join(dfreq, "sh")
          .withColumn("rnk", row_number().over(wDoc))
        time("3 ranked (df join + window)")(noop(ranked))
        val cands = graft.operators.Dedup.containmentCandidates(docs)
        time("4 candidates distinct")(noop(cands))
        val sets = docs.select(col("doc_id"), Text.shingles3(col("text")).as("shingles"))
          .where(size(col("shingles")) > 0)
        time("5 sets (re-shingle)")(noop(sets))
        time("6 full query")(noop(graft.operators.Dedup.qDedupContainment(spark, sfDir)))
      case "contjoin" =>
        // join-strategy A/B for the containment verify (guide §3.1):
        // AQE broadcasts the 50 MB sets side twice (serial hashed-
        // relation builds); at 100 TB that side is corpus-sized and
        // can never broadcast. Compare forced shuffle-hash / SMJ.
        import graft.functions.Text
        import graft.functions.MultisetOverlap
        val docs = graft.Tables.documents(spark, sfDir)
        val cands = graft.operators.Dedup.containmentCandidates(docs)
        def verify(hint: Option[String]): DataFrame = {
          val sets0 = docs.select(col("doc_id"),
              Text.shingles3(col("text")).as("shingles"))
            .where(size(col("shingles")) > 0)
          val sets = hint.map(sets0.hint(_)).getOrElse(sets0)
          val inter = MultisetOverlap.multisetOverlap(col("sh_a"), col("sh_b"))
          cands
            .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
            .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
            .withColumn("shared", inter.cast("long"))
            .withColumn("c_ab", col("shared") / size(col("sh_a")))
            .withColumn("c_ba", col("shared") / size(col("sh_b")))
            .where(greatest(col("c_ab"), col("c_ba")) >= 0.9)
            .select(col("doc_a"), col("doc_b"), col("shared"))
        }
        time("verify broadcast (AQE default)")(noop(verify(None)))
        time("verify shuffle_hash")(noop(verify(Some("shuffle_hash"))))
        time("verify merge (SMJ)")(noop(verify(Some("merge"))))
      case "candsab" =>
        // candidate-shape A/B: r14 (prefix ⋈ raw postings + size
        // predicate) vs r15 (prefix ⋈ ranked postings + size +
        // positional) — the positional filter must pay for the second
        // window pass it needs
        import graft.functions.Text
        val docs = graft.Tables.documents(spark, sfDir)
        val t = 0.9
        val sh = docs.select(col("doc_id"), Text.shingles3(col("text")).as("shs"))
          .withColumn("ns", size(col("shs")))
          .select(col("doc_id"), col("ns"), explode(col("shs")).as("sh"))
        val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        val wDoc = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("df", "sh")
        val ranked = sh.join(dfreq, "sh")
          .withColumn("rnk", row_number().over(wDoc))
        val prefix = ranked
          .where(col("rnk") <= col("ns") - ceil(lit(t) * col("ns")) + 1)
          .select("doc_id", "ns", "sh", "rnk")
        val old = prefix.as("a")
          .join(sh.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id") &&
            col("b.ns") >= ceil(lit(t) * col("a.ns")))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
                  greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .distinct()
        println(s"[probe] old candidates: ${old.count()}")
        time("candidates r14 shape")(noop(old))
        val neu = graft.operators.Dedup.containmentCandidates(docs)
        println(s"[probe] new candidates: ${neu.count()}")
        time("candidates r15 shape")(noop(neu))
      case "cands" =>
        // candidate-set size + full-query timing for the prefix-filter
        // dedups (verdict item 3). The BEFORE candidate counts for
        // comparison: r14 measured 72,160 containment candidates at
        // sf0.1 (OPTIMIZATION_r14.md wave 2).
        val docs = graft.Tables.documents(spark, sfDir)
        val nCont = graft.operators.Dedup.containmentCandidates(docs).count()
        println(s"[probe] containment candidates (pruned): $nCont")
        time("qDedupContainment full")(
          noop(graft.operators.Dedup.qDedupContainment(spark, sfDir)))
        time("qDedupNgramJaccard full")(
          noop(graft.operators.Dedup.qDedupNgramJaccard(spark, sfDir)))
      case "verbatim" =>
        time("qVerbatimRewrite full")(
          noop(graft.operators.Dedup.qVerbatimRewrite(spark, sfDir)))
      case "gopher" =>
        // the bench row count()-prunes the flags; noop pays them
        time("qTextGopherRules noop")(
          noop(graft.operators.TextAnalysis.qTextGopherRules(spark, sfDir)))
      case "prefpairs" =>
        time("qPreferencePairs full")(
          noop(graft.operators.EvalScoring.qPreferencePairs(spark, sfDir)))
      case other => System.err.println(s"unknown probe $other")
    }
    spark.stop()
  }
}
