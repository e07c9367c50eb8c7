package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The round-7 scale-path gates: √n-centroid embedding near-dup and
  * the streaming sessionizer replay. Hash correctness is the driver
  * gate's job (dedup_embedding_scaled / stream_sessions oracles);
  * these specs pin the properties the gate can't see — plan-build
  * cost and batch/stream parity.
  */
class ScaledPathsSpec extends SparkSpec {

  test("building the scaled embedding plan runs zero Spark jobs") {
    // corpus sizing must come from parquet footers, not emb.count():
    // at 100 TB a count() scan per plan construction is a full pass
    // over the corpus before any work starts
    // suites share one SparkSession and may run in parallel — count
    // only jobs from THIS thread's job group, so another suite's
    // actions can't trip (or mask) the assertion
    val group = "scaledpaths-nojob"
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        if (group == jobStart.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, "scaled-embedding plan build")
    try {
      // self-validate the listener: a real action must be seen (the
      // listener bus is async — poll until the event lands)
      spark.range(2).count()
      val deadline = System.nanoTime() + 5e9.toLong
      while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() > 0, "listener never saw the sanity-check job")

      // spark.read.parquet itself costs one tiny schema-inference job,
      // so "zero jobs" is measured RELATIVE to the fixed-config plan:
      // the √n sizing must add nothing on top (an emb.count() would
      // add a full-scan job here)
      def jobsToBuild(build: => org.apache.spark.sql.DataFrame): Int = {
        val before = jobs.get()
        val plan = build
        assert(plan.columns.toSeq == Seq("id_a", "id_b", "sim"))
        Thread.sleep(300) // grace for the async job-start events
        jobs.get() - before
      }
      val fixedJobs = jobsToBuild(Similarity.qDedupEmbeddingBlocked(spark, sf))
      val scaledJobs = jobsToBuild(Similarity.qDedupEmbeddingScaled(spark, sf))
      assert(scaledJobs <= fixedJobs,
        s"√n sizing submitted ${scaledJobs - fixedJobs} extra job(s) over " +
        "the fixed config — corpus sizing regressed to a count() scan")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("scaled centroid sizing: √n floored at the fixed-gate count") {
    assert(Similarity.scaledCentroids(0L) == 8)
    assert(Similarity.scaledCentroids(64L) == 8)
    assert(Similarity.scaledCentroids(65L) == 9)     // ceil(√65) = 9
    assert(Similarity.scaledCentroids(10000L) == 100)
    assert(Similarity.scaledCentroids(1000000L) == 1000)
  }

  test("scaled pairs are true near-dups: a subset of the exact all-pairs set") {
    // blocked output ⊆ exact by construction (candidates are verified
    // with the true cosine) — blocking may lose recall, never add noise
    val exactDf = Similarity.qDedupEmbedding(spark, sf)
      .select("id_a", "id_b").collect().toSet
    val scaled = Similarity.qDedupEmbeddingScaled(spark, sf)
      .select("id_a", "id_b").collect().toSet
    assert(scaled.subsetOf(exactDf),
      s"scaled-only pairs: ${(scaled diff exactDf).take(3)}")
  }

  test("knn graph: dense top-k per vector with true descending cosines") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (out <- Seq(Similarity.qSimKnnGraph(spark, sf).collect(),
                    Similarity.qSimKnnGraphScaled(spark, sf).collect())) {
      val byVec = out.groupBy(_.getLong(0))
      assert(byVec.size.toLong == vecs.size, "every vector has a neighbor list")
      byVec.foreach { case (v, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length),
          s"vec $v ranks not dense from 1")
        assert(sorted.length == 3, s"vec $v has ${sorted.length} neighbors, want 3")
        assert(sorted.forall(_.getLong(2) != v), s"vec $v lists itself")
        val sims = sorted.map(_.getDouble(3))
        assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
          s"vec $v sims not descending: ${sims.toSeq}")
        // reported sim is the true 4dp-rounded cosine of the pair
        sorted.foreach { r =>
          val true4 = math.floor(cos(vecs(v), vecs(r.getLong(2))) * 10000 + 0.5) / 10000
          assert(r.getDouble(3) == true4,
            s"vec $v → ${r.getLong(2)}: reported ${r.getDouble(3)} vs true $true4")
        }
      }
    }
  }

  test("mutual-knn clusters: labels are component minima over exactly the mutual edge set") {
    val knn = Similarity.qSimKnnGraphScaled(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val mutual = knn.filter { case (a, b) => a < b && knn((b, a)) }
    val clusters = Similarity.qSimMutualKnnClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mutual.nonEmpty && clusters.nonEmpty)
    // exactly the mutually-listed vectors are clustered
    assert(clusters.keySet == mutual.flatMap(e => Seq(e._1, e._2)),
      "clustered vectors ≠ vectors with a mutual edge")
    // each mutual edge lands inside one cluster
    mutual.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"mutual edge ($a,$b) spans clusters")
    }
    // the label is the component minimum: it names a member, no
    // member undercuts it, and labels don't bridge across edges
    // (transitivity is the oracle's recursive-closure half)
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keySet.min == label,
        s"cluster $label labeled above its minimum ${members.keySet.min}")
    }
  }

  test("streaming sessionizer replay equals the batch window sessionizer") {
    val stream = graft.streaming.StatefulSessions.qStreamSessions(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Sessions.qSessionize(spark, sf)
      .select(col("user_id").cast("long"), col("session_idx"),
              col("start_sec"), col("visit_length"), col("step_length"),
              col("purchases"))
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"stream=${stream.size} batch=${batch.size} " +
      s"diff=${(stream diff batch).take(2)} / ${(batch diff stream).take(2)}")
  }
}
