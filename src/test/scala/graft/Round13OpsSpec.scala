package graft

import org.apache.spark.sql.functions._
import graft.operators.{EvalScoring, Mixing, Packing, Similarity, TextAnalysis}

/** Round-13 wave: Bradley–Terry fitting, per-domain capping, the
  * packing-efficiency audit, DSIR importance weights, and the IVF
  * recall audit. The oracle gates pin exact values; these specs pin
  * the PROPERTIES a reader needs to trust the operators — fit
  * direction, bounded-heap plan shape, conservation laws, signal
  * sign, and recall bounds. */
class Round13OpsSpec extends SparkSpec {

  import spark.implicits._

  test("bradley-terry: dominant player fits stronger; even duels fit equal") {
    val duels = Seq(
      ("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"), // a beats b 3-1
      ("a", "c"), ("c", "a"),                         // a-c even
      ("b", "c"), ("c", "b")                          // b-c even
    ).toDF("winner", "loser")
    val fit = EvalScoring.bradleyTerryFit(duels).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(fit("a") > fit("b"), s"3-1 dominance must fit stronger: $fit")
    assert(fit("a") > fit("c") || fit("a") == fit("c"),
      s"a never loses overall: $fit")
    // symmetric 1-1 duel pair with identical schedules fits equal
    val even = Seq(("x", "y"), ("y", "x")).toDF("winner", "loser")
    val ef = EvalScoring.bradleyTerryFit(even).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(ef("x") == ef("y") && ef("x") == 1.0,
      s"even duels must fit the normalized 1.0: $ef")
  }

  test("bradley-terry: rank ties break by source, games/wins are exact") {
    val duels = Seq(("a", "b")).toDF("winner", "loser")
    val rows = EvalScoring.bradleyTerryFit(duels).collect()
    val byS = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(byS("a") == ((1L, 1L, 1L)), s"winner row wrong: ${byS("a")}")
    assert(byS("b") == ((1L, 0L, 2L)), s"loser row wrong: ${byS("b")}")
  }

  test("domain cap runs on the bounded-heap operator and caps every source") {
    val out = Mixing.qDomainCap(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"),
      "domain cap must select via the bounded-heap operator, not a full window sort")
    val perSource = out.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    perSource.foreach(r => assert(r.getLong(1) <= 5,
      s"source ${r.getString(0)} kept ${r.getLong(1)} > cap"))
  }

  test("pack efficiency conserves tokens against pack_boundaries and bounds its ratios") {
    val eff = Packing.qPackEfficiency(spark, sf).head
    val boundaryTotal = Packing.qPackBoundaries(spark, sf)
      .agg(sum("started_tokens")).head.getLong(0)
    assert(eff.getAs[Long]("total_tokens") == boundaryTotal,
      "efficiency total must equal the sum of per-sequence started tokens")
    val share = eff.getAs[Double]("crossing_share")
    assert(share >= 0.0 && share <= 1.0)
    assert(eff.getAs[Long]("n_crossings") >= eff.getAs[Long]("n_crossing_docs"),
      "a crossing doc crosses at least once")
    val lastFill = eff.getAs[Long]("last_fill")
    assert(lastFill >= 0 && lastFill <= 256)
  }

  test("dsir weights: with a genuinely-disjoint domain split, target docs score positive and the rest negative") {
    // two disjoint vocabularies: "code" docs (the target) and
    // "recipe" docs — the regime DSIR is for. On the FIXTURE corpus
    // the lang slices share one synthetic vocabulary, so the gate
    // pins exact values and this spec pins the sign property where
    // it is provable.
    val docs = (0L until 40L).map { i =>
      if (i % 4 == 0) (i, "parse compile link emit bytecode register", "code")
      else (i, "flour butter sugar oven whisk bake fold", "recipe")
    }.toDF("doc_id", "text", "lang")
    val w = TextAnalysis.dsirWeightsOf(docs, col("lang") === "code")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val means = w.groupBy(col("lang") === "code")
      .agg(avg("log_weight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > 0.0 && means(false) < 0.0,
      s"disjoint-domain sign property violated: $means")
    assert(means(true) > means(false))
  }

  test("pass@k: closed form per c, all regimes present, monotone in c") {
    val rows = EvalScoring.qEvalPassAtK(spark, sf).collect()
    assert(rows.length == 500)
    val seen = rows.map(_.getLong(2)).toSet
    assert(seen.contains(0L) && seen.exists(_ >= 3L),
      s"fixture should exercise low and high c regimes: $seen")
    rows.foreach { r =>
      val c = r.getLong(2)
      val p1 = r.getDouble(3); val p3 = r.getDouble(4)
      assert(math.abs(p1 - c / 5.0) < 1e-9, s"pass@1 must be c/n: $r")
      if (c == 0) assert(p3 == 0.0)
      if (c >= 3) assert(p3 == 1.0, s"c=$c >= n-k+1 forces pass@3 = 1: $r")
      assert(p3 >= p1 - 1e-9, "a bigger draw can only help")
    }
  }

  test("cluster sample: bounded-heap plan, <=10 per cluster, disjoint from the outlier fringe") {
    val sample = operators.Clustering.qEmbClusterSample(spark, sf)
    assert(sample.queryExecution.executedPlan.toString.contains("GroupedTopK"))
    val perCluster = sample.groupBy("cluster").count().collect()
    perCluster.foreach(r => assert(r.getLong(1) <= 10))
    // prototypes (nearest) and outliers (farthest decile) cannot meet
    // in any cluster with >= 12 members
    val sizes = operators.Clustering.qEmbKmeans(spark, sf)
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val outliers = operators.Clustering.qEmbOutliers(spark, sf)
      .where(col("outlier")).select("vec_id").collect().map(_.getLong(0)).toSet
    val clash = sample.collect()
      .filter(r => sizes(r.getLong(1)) >= 12 && outliers(r.getLong(0)))
    assert(clash.isEmpty, s"prototype/outlier overlap: ${clash.toSeq}")
  }

  test("bradley-terry counts are mergeable: split fits equal the one-shot fit") {
    val duels = Seq(("a","b"),("a","b"),("b","c"),("c","a"),("a","c"),("b","a"))
    val full = EvalScoring.bradleyTerryFit(duels.toDF("winner","loser"))
      .collect().map(_.toSeq)
    val (h1, h2) = duels.splitAt(3)
    def counts(d: Seq[(String,String)]) =
      d.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val merged = (counts(h1).toSeq ++ counts(h2).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val split = EvalScoring.bradleyTerryFromCounts(spark, merged)
      .collect().map(_.toSeq)
    assert(full.toSeq == split.toSeq)
  }

  test("ece bins: gap consistency and the overconfident model shows net positive miscalibration") {
    val bins = EvalScoring.qEvalEce(spark, sf).collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val b = r.getLong(0)
      assert(b >= 0 && b <= 9)
      val (ac, aa, gap) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(gap - math.floor(math.abs(ac - aa) * 1e4 + 0.5) / 1e4) < 1e-9,
        s"gap must be the rounded |conf-acc|: $r")
    }
    // correctness draws under conf^2: in aggregate accuracy must sit
    // BELOW confidence (per-bin noise may flip a small bin, the
    // n-weighted sum may not)
    val net = bins.map(r => r.getLong(1) * (r.getDouble(2) - r.getDouble(3))).sum
    assert(net > 0.0, s"overconfident synthetic model must show net positive gap: $net")
  }

  test("silhouette: cluster agrees with kmeans assignment, a<=b by construction, values bounded") {
    val sil = operators.Clustering.qEmbSilhouette(spark, sf)
    val asg = operators.Clustering.qEmbKmeans(spark, sf)
      .select(col("vec_id"), col("cluster").as("k_cluster"))
    val joined = sil.join(asg, "vec_id").collect()
    assert(joined.length == 500)
    joined.foreach { r =>
      assert(r.getAs[Long]("cluster") == r.getAs[Long]("k_cluster"),
        s"silhouette cluster must be the kmeans assignment: $r")
      val (a, b, sv) = (r.getAs[Double]("a_dist"), r.getAs[Double]("b_dist"),
        r.getAs[Double]("silhouette"))
      assert(a <= b + 1e-9, s"own centroid must be nearest: $r")
      assert(sv >= -1.0 && sv <= 1.0)
      assert(sv >= 0.0, "with a<=b the simplified silhouette is non-negative")
    }
  }

  test("matryoshka recall: bounded, and an identity truncation gives recall 1") {
    val rec = operators.Similarity.qMatryoshkaRecall(spark, sf).collect()
    assert(rec.length == 10)
    rec.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rc = r.getDouble(3)
      assert(rc >= 0.0 && rc <= 1.0)
    }
    // sanity of the machinery: exact-vs-exact on the same vectors is
    // total recall (uses the gate's own joined shape via recall=1 on
    // every query when truncation width >= dim would be identity;
    // here assert instead that SOME query keeps hits — a 16/64 prefix
    // of random-ish embeddings preserving zero neighbors would mean
    // the join keys are broken, not the data)
    assert(rec.map(_.getLong(2)).sum > 0,
      "prefix truncation lost every neighbor for every query — join keys broken?")
  }

  test("ivf recall: bounded, and equal to the set intersection of the two gates") {
    val rec = Similarity.qIvfRecall(spark, sf).collect()
    assert(rec.length == 10)
    rec.foreach { r =>
      val (ne, nh, rc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nh <= ne && rc >= 0.0 && rc <= 1.0)
      assert(math.abs(rc - math.floor(nh.toDouble / ne * 1e4 + 0.5) / 1e4) == 0.0)
    }
    // independent recomputation from the two ranked lists
    val exact = Similarity.qSimBruteForce(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val approx = Similarity.qSimIvf(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    rec.foreach { r =>
      val q = r.getLong(0)
      val hits = exact(q).intersect(approx.getOrElse(q, Set.empty)).size
      assert(r.getLong(2) == hits, s"q=$q hits mismatch")
    }
  }
}
