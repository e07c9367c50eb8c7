package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text
import graft.functions.VectorFunctions.cosine

/** Lloyd's k-means over the `embeddings` table — the semantic
  * clustering step of a data-mixing / semantic-dedup pipeline
  * (cluster the corpus, then rebalance or prune per cluster).
  *
  * The distributed shape is the textbook one and it is the reason
  * k-means scales: the model (k×dim centroids) is tiny while the data
  * is huge, so each iteration is
  *   1. a MAP-ONLY assignment pass — centroids ride into the plan as
  *      literal arrays, so no join, no shuffle of the corpus, and the
  *      arg-min over k distances is one codegen'd projection;
  *   2. a centroid update whose shuffle is k·dim rows PER PARTITION
  *      (posexplode feeds a hash aggregate, so partial aggregation
  *      runs map-side) — independent of corpus size.
  * The driver holds only k×dim doubles between iterations (model
  * state, not data — the one collect() an iterative fitter is allowed).
  *
  * The literal-centroid arg-min is the right shape up to k in the
  * hundreds (the projection holds k copies of the distance fold; the
  * plan grows with k). Beyond that — k ~ 10⁴+ partitioned semantic
  * clustering — the assignment becomes a broadcast join against a
  * centroid table + `min_by` aggregation: one extra shuffle of
  * (vec_id, best) pairs, same update pass. The k=8 gate pins the
  * map-only shape; the crossover is a documented dial, not a cliff.
  *
  * Determinism contract (what lets a DuckDB oracle replay it): init
  * centroids are the first k vectors; every centroid coordinate is
  * rounded HALF-UP to 4 decimals after averaging, so the engines'
  * different summation orders collapse to identical bits before the
  * next assignment; distances are squared-Euclidean summed in array
  * order; arg-min ties break on the lower cluster id.
  */
object Clustering {

  private val K = 8
  private val Iters = 2
  private val Scale = 4 // centroid rounding, decimals

  private def roundTo(x: Double): Double = {
    val p = math.pow(10, Scale)
    math.floor(x * p + 0.5) / p
  }

  /** Squared Euclidean distance between two double-array columns —
    * the native [[graft.functions.SquaredDistance]] kernel (one tight
    * codegen'd loop; the HOF composition it replaced is interpreted
    * per element, which the joined assignment pays on n·k candidate
    * rows). The fold order is the array order, so both k-means shapes
    * (and the oracle) compute the same bits — ExpressionSpec pins the
    * kernel to its HOF twin. */
  private def sqDistCols(v: Column, c: Column): Column =
    graft.functions.VectorFunctions.sqDist(v, c)

  private def sqDist(v: Column, centroid: Array[Double]): Column =
    sqDistCols(v, typedlit(centroid))

  /** Arg-min cluster for a vector given the current centroids: an
    * array of (dist, c_id) structs reduced with array_min — struct
    * ordering is lexicographic, so min dist wins and the lower c_id
    * breaks exact ties. */
  private def assign(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    array_min(array(cents.map { case (id, c) =>
      struct(sqDist(v, c).as("d"), lit(id).as("c_id"))
    }: _*))

  /** One centroid update: members exploded to (cluster, pos, val),
    * averaged per coordinate, reassembled driver-side. The collect is
    * ≤ k·dim rows (512 here) regardless of corpus size. Clusters that
    * lost every member simply drop out (both engines see the same
    * member sets, so they drop identically). */
  private def updateCentroids(assigned: DataFrame): Seq[(Int, Array[Double])] =
    assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy("cluster", "pos")
      .agg(avg("val").as("mv"))
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (cid, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getInt(1)) = roundTo(r.getDouble(2)))
        cid -> arr
      }
      .sortBy(_._1)

  /** Centroid sets elementwise-equal (same ids, same rounded
    * coords) — the Lloyd FIXED POINT: identical centroids produce
    * identical assignments, hence identical next centroids, so every
    * further iteration is provably a no-op. The HALF-UP rounding both
    * engines share makes this an exact (bitwise) comparison, not an
    * ε-tolerance — which is why stopping early can never diverge from
    * an oracle that unrolls the full iteration count. */
  private def converged(a: Seq[(Int, Array[Double])],
                        b: Seq[(Int, Array[Double])]): Boolean =
    a.size == b.size && a.zip(b).forall { case ((i, u), (j, v)) =>
      i == j && java.util.Arrays.equals(u, v)
    }

  /** The Lloyd loop with convergence stop: run `step` up to `iters`
    * times, stopping as soon as the centroids stop moving. Returns
    * the final centroids and how many iterations actually ran —
    * ConvergenceSpec pins that a pre-converged corpus stops after one.
    * One Spark job per executed iteration, zero extra jobs for the
    * check: movement falls out of the model the update already
    * collects (k·dim doubles, driver-side). */
  private def lloyd(init: Seq[(Int, Array[Double])], iters: Int,
                    step: Seq[(Int, Array[Double])] => Seq[(Int, Array[Double])])
      : (Seq[(Int, Array[Double])], Int) = {
    var cents = init
    var ran = 0
    var done = false
    while (ran < iters && !done) {
      val next = step(cents)
      done = converged(cents, next)
      cents = next
      ran += 1
    }
    (cents, ran)
  }

  /** vec_id → final cluster (+ rounded distance) after [[Iters]]
    * Lloyd iterations from the deterministic first-k init. The FIT is
    * memoized per (session, corpus, k, iters)
    * ([[graft.core.ModelCache]], fingerprint-invalidated): the Lloyd
    * jobs run once per session, and re-invocations are the map-only
    * assignment projection — the build-once treatment the IVF index
    * has, for the model that lives as driver state. */
  def qEmbKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = prepared(Tables.embeddings(spark, dir))
    kmeansAssignWith(emb, kmeansModelFor(spark, dir, K, Iters)._1)
  }

  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** The memoized literal-shape Lloyd fit for the embeddings backing
    * `dir`. */
  private def kmeansModelFor(spark: SparkSession, dir: String, k: Int,
      iters: Int): (Seq[(Int, Array[Double])], Int) =
    graft.core.ModelCache.corpusModel(spark, s"kmeans:$k:$iters",
      s"$dir/embeddings.parquet") {
      kmeansFit(prepared(Tables.embeddings(spark, dir)), k, iters)
    }

  /** The large-k assignment shape, pinned by the SAME oracle as
    * [[qEmbKmeans]] (two plans, one semantics — the dedup_clusters /
    * dedup_clusters_dist precedent): centroids live in a broadcast
    * table instead of projection literals, and the arg-min is
    * `min_by` over the ×k candidate rows. The projection no longer
    * grows with k (the limit of the literal shape), at the cost of a
    * vec_id-hash shuffle of n·k slim rows. Use when k is beyond the
    * literal crossover (~hundreds); the k=8 gate proves equivalence. */
  def qEmbKmeansJoined(spark: SparkSession, dir: String): DataFrame = {
    val emb = prepared(Tables.embeddings(spark, dir))
    kmeansJoinedAssign(emb, kmeansJoinedModelFor(spark, dir, K, Iters)._1)
  }

  /** The memoized joined-shape Lloyd fit: the model stays a
    * lineage-truncated k-row FRAME (k·dim doubles of block-manager
    * state — never deserialized driver-side), held per
    * (session, corpus, k, iters) like [[kmeansModelFor]]. */
  private def kmeansJoinedModelFor(spark: SparkSession, dir: String, k: Int,
      iters: Int): (DataFrame, Int) =
    graft.core.ModelCache.corpusModel(spark, s"kmeans_joined:$k:$iters",
      s"$dir/embeddings.parquet") {
      kmeansJoinedFit(prepared(Tables.embeddings(spark, dir)), k, iters)
    }

  /** EMBEDDING OUTLIER PRUNING — the per-cluster distance tail as a
    * data-quality flag: a vector is an outlier when it ranks in the
    * top ⌈10 %⌉ of its own cluster by distance-to-centroid (rounded
    * dist DESC, exact ties to the lower vec_id). This is the standard
    * embedding-space pruning signal (mislabeled / off-distribution
    * examples sit far from every prototype); SemDeDup prunes the
    * near-duplicate CORE of a cluster, this flags its frayed EDGE —
    * the two ends of the same cluster-geometry curation story.
    *
    * Rank-based (not a distance threshold) deliberately: the flag is
    * exactly determined by the rounded distances both engines already
    * agree on — no floating threshold recomputed with a different
    * summation order on each side. Scale shape: the fit is the
    * memoized Lloyd model; the flagging adds ONE window over the
    * assignment keyed by cluster — k partitions of ~n/k rows, the
    * same distribution the assignment shuffle already produced. */
  def qEmbOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the UNSORTED assignment core: inheriting qEmbKmeans' output
    // sort would range-exchange + sort the corpus only for the
    // cluster window to destroy it (the knnTopK no-inherited-sort
    // convention)
    val emb = prepared(Tables.embeddings(spark, dir))
    val asg = kmeansAssignCore(emb, kmeansModelFor(spark, dir, K, Iters)._1)
    val w = Window.partitionBy("cluster").orderBy(desc("dist"), col("vec_id"))
    val wc = Window.partitionBy("cluster")
    asg
      .withColumn("r", row_number().over(w))
      .withColumn("nc", count(lit(1)).over(wc))
      .select(col("vec_id"), col("cluster"), col("dist"),
        (col("r") <= (col("nc") + lit(9)) / lit(10)).as("outlier"))
      .orderBy("vec_id")
  }

  /** SIMPLIFIED-SILHOUETTE CLUSTER QUALITY — the per-vector audit of
    * a clustering a curation pipeline should publish next to the
    * clusters it used (SemDeDup pruning and cluster-balanced sampling
    * are only as good as the cluster geometry): a = distance to the
    * OWN centroid, b = distance to the nearest OTHER centroid,
    * silhouette = (b − a)/max(a, b) ∈ [−1, 1]. Negative rows sit
    * closer to a foreign prototype than their own — the standard
    * mis-clustered flag; the corpus mean prices the whole fit. This
    * is the centroid-based simplified silhouette (Hruschka et al.) —
    * the exact pairwise silhouette is O(n²) and needs no engine at
    * all for small n, while the simplified form is O(n·k), scale-free
    * in corpus size, and the one production clustering reports.
    *
    * Scale shape: the fit is the memoized Lloyd model; scoring is
    * MAP-ONLY over the centroid literals (per row: k squared
    * distances, sort of a k-array — model-sized work inside codegen),
    * same contract as the assignment projection. Distances are
    * euclidean (sqrt of the Lloyd metric); silhouette is computed on
    * unrounded a, b and rounded only at output. */
  def qEmbSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val emb = prepared(Tables.embeddings(spark, dir))
    val cents = kmeansModelFor(spark, dir, K, Iters)._1
    if (cents.size < 2)
      return emb.where(lit(false)).select(col("vec_id"),
        lit(0L).as("cluster"), lit(0.0).as("a_dist"),
        lit(0.0).as("b_dist"), lit(0.0).as("silhouette"))
    val ranked = sort_array(array(cents.map { case (id, c) =>
      struct(sqDist(col("v"), c).as("d"), lit(id).as("c_id"))
    }: _*))
    val d1 = sqrt(ranked.getItem(0).getField("d"))
    val d2 = sqrt(ranked.getItem(1).getField("d"))
    emb.select(
        col("vec_id"),
        ranked.getItem(0).getField("c_id").cast("long").as("cluster"),
        Text.roundPortable(d1, Scale).as("a_dist"),
        Text.roundPortable(d2, Scale).as("b_dist"),
        when(greatest(d1, d2) === 0.0, lit(0.0))
          .otherwise(Text.roundPortable(
            (d2 - d1) / greatest(d1, d2), Scale)).as("silhouette"))
      .orderBy("vec_id")
  }

  /** Map-only assignment of ANY (vec_id, embedding) frame against the
    * STANDING corpus model — the online-serving shape
    * ([[graft.streaming.StreamReplays.qStreamClusterAssign]] drives
    * micro-batches through it); the identical projection
    * [[qEmbKmeans]] gates, so the streaming twin dispatches the same
    * oracle. */
  private[graft] def assignAgainstCorpusModel(spark: SparkSession,
      dir: String, vecs: DataFrame): DataFrame =
    kmeansAssignWith(prepared(vecs), kmeansModelFor(spark, dir, K, Iters)._1)

  // prototype coreset size per cluster
  private val ClusterSampleM = 10

  /** CLUSTER-BALANCED PROTOTYPE SAMPLING — the diversity-coreset
    * draw of cluster-aware curation (and the complement of
    * [[qEmbOutliers]]' fringe flag): per Lloyd cluster, keep the
    * [[ClusterSampleM]] vectors CLOSEST to the centroid — one
    * prototype panel per mode of the distribution, so a sample built
    * from them covers every cluster instead of riding the head
    * cluster's mass. Rank on the ROUNDED distance (asc, vec_id ties)
    * — the emb_outliers determinism rule: the flag derives only from
    * numbers both engines already agree on.
    *
    * Scale shape: the fit is the memoized Lloyd model; selection is
    * the bounded-heap [[graft.plans.GroupedTopK]] keyed by cluster —
    * ≤m rows per cluster per task, no cluster ever fully sorted (the
    * q_domain_cap contract with clusters for domains); the rank
    * window after it sees ≤m rows per cluster. */
  def qEmbClusterSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = prepared(Tables.embeddings(spark, dir))
    val asg = kmeansAssignCore(emb, kmeansModelFor(spark, dir, K, Iters)._1)
    val kept = graft.plans.GroupedTopKApi.groupedTopKOrdered(asg,
      keys = Seq("cluster"),
      sort = Seq("dist" -> true, "vec_id" -> true),
      k = ClusterSampleM)
    kept
      .withColumn("rank", row_number().over(
        Window.partitionBy("cluster")
          .orderBy(col("dist"), col("vec_id"))).cast("long"))
      .select("vec_id", "cluster", "dist", "rank")
      .orderBy("vec_id")
  }

  /** Core with k and the iteration count exposed (spec dial: more
    * iterations must not increase within-cluster sum of squares). */
  private[graft] def kmeans(embeddings: DataFrame, k: Int,
                            iters: Int): DataFrame =
    kmeansWithStats(embeddings, k, iters)._1

  /** [[kmeans]] plus the executed-iteration count (convergence-stop
    * observability for ConvergenceSpec). */
  private[graft] def kmeansWithStats(embeddings: DataFrame, k: Int,
                                     iters: Int): (DataFrame, Int) = {
    val emb = prepared(embeddings)
    val (cents, ran) = kmeansFit(emb, k, iters)
    (kmeansAssignWith(emb, cents), ran)
  }

  /** The Lloyd FIT alone: deterministic first-k init, at most `iters`
    * update passes, convergence-stopped. Returns (model, executed
    * iterations) — the driver state [[kmeansModelFor]] memoizes. */
  private[graft] def kmeansFit(emb: DataFrame, k: Int,
      iters: Int): (Seq[(Int, Array[Double])], Int) = {
    val init: Seq[(Int, Array[Double])] = emb
      .where(col("vec_id") < k)
      .collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Double](1).iterator.map(roundTo).toArray))
      .sortBy(_._1)
      .toSeq
    if (init.isEmpty) return (Nil, 0)
    lloyd(init, iters, cents =>
      updateCentroids(
        emb.withColumn("cluster", assign(col("v"), cents).getField("c_id"))))
  }

  /** MAP-ONLY assignment of a prepared (vec_id, v) frame under a
    * fitted model. An empty model ⇔ empty corpus: returns the empty
    * result frame instead of building assign()'s literal model —
    * array_min over a zero-literal array() is VOID-typed and fails
    * analysis (the NearestCells empty-quantizer contract,
    * literal-model edition). */
  private def kmeansAssignWith(emb: DataFrame,
      cents: Seq[(Int, Array[Double])]): DataFrame =
    kmeansAssignCore(emb, cents).orderBy("vec_id")

  /** The assignment WITHOUT the presentation sort — consumers that
    * re-key (the outlier window) take this so they never inherit a
    * corpus-wide sort they immediately destroy. */
  private def kmeansAssignCore(emb: DataFrame,
      cents: Seq[(Int, Array[Double])]): DataFrame = {
    if (cents.isEmpty)
      return emb.where(lit(false)).select(
        col("vec_id"), lit(0L).as("cluster"), lit(0.0).as("dist"))
    val best = assign(col("v"), cents)
    emb.select(
        col("vec_id"),
        best.getField("c_id").cast("long").as("cluster"),
        Text.roundPortable(best.getField("d"), Scale).as("dist"))
  }

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023): cluster the
    * corpus with k-means, then prune within each cluster — a vector is
    * pruned when some OTHER member of its cluster is cosine-similar
    * above the threshold and outranks it (farther from the centroid;
    * exact dist ties break to the lower vec_id). The survivor of each
    * similar group is the member farthest from the centroid — the
    * paper's keep-rule, chosen there because centroid-distant examples
    * carry more signal.
    *
    * Scale shape: clustering is the whole point — the pairwise cosine
    * join keys on `cluster`, so candidate pairs are Σ|cluster|², not
    * n². The gate pins k=8 (the same config the kmeans oracle
    * unrolls); [[qSemanticDedupScaled]] gates the √n-k / joined-
    * assignment config where per-cluster size stays ~√n and total
    * pair work ~n^1.5 — the same growth contract as
    * [[Similarity.qDedupEmbeddingScaled]]'s IVF blocking, but with
    * learned (Lloyd) cells and a per-cluster keep-rule rather than
    * emitted pairs. */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.embeddings(spark, dir)
    semanticDedupAssigned(raw,
      kmeansAssignWith(prepared(raw), kmeansModelFor(spark, dir, K, Iters)._1))
  }

  /** The scale config of [[qSemanticDedup]]: k grows as √n (floored
    * at the fixed-gate k) so expected cluster size stays ~√n, and the
    * assignment uses the broadcast-join shape (the literal projection
    * would hold √n distance folds). Corpus size comes from parquet
    * footer metadata — planning runs zero jobs. Same oracle recipe,
    * k derived in SQL from the same corpus. */
  def qSemanticDedupScaled(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/embeddings.parquet")
    val k = math.max(K, math.ceil(math.sqrt(n.toDouble)).toInt)
    val raw = Tables.embeddings(spark, dir)
    semanticDedupAssigned(raw, kmeansJoinedAssign(prepared(raw),
      kmeansJoinedModelFor(spark, dir, k, Iters)._1))
  }

  private val SemDedupThreshold = 0.45 // same cut the embedding near-dup gates pin

  /** Core: kmeans assignment (either shape) + within-cluster prune.
    * Output is every vector with its cluster, rounded centroid
    * distance, and a `kept` verdict — the downstream corpus filter is
    * `WHERE kept`. The prune join carries the raw float embedding for
    * the codegen'd cosine and compares on the ROUNDED dist (both
    * engines round HALF-UP to 4 decimals first, so the rank order is
    * cross-engine deterministic). */
  private[graft] def semanticDedup(embeddings: DataFrame, k: Int,
                                   iters: Int, joined: Boolean): DataFrame =
    semanticDedupAssigned(embeddings,
      if (joined) kmeansJoined(embeddings, k, iters)
      else kmeans(embeddings, k, iters))

  /** [[semanticDedup]]'s prune under an EXPLICIT assignment frame —
    * the seam the memoized-model entry points feed. */
  private def semanticDedupAssigned(embeddings: DataFrame,
                                    assigned: DataFrame): DataFrame = {
    val av = assigned.join(
      embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val a = av.select(col("cluster"), col("vec_id").as("id_a"),
                      col("dist").as("dist_a"), col("embedding").as("v_a"))
    val b = av.select(col("cluster"), col("vec_id").as("id_b"),
                      col("dist").as("dist_b"), col("embedding").as("v_b"))
    val pruned = a.join(b, Seq("cluster"))
      .where(col("id_a") =!= col("id_b") &&
             (col("dist_a") > col("dist_b") ||
              (col("dist_a") === col("dist_b") && col("id_a") < col("id_b"))))
      .where(cosine(col("v_a"), col("v_b")) >= SemDedupThreshold)
      .select(col("id_b").as("vec_id")).distinct()
    av.join(pruned.withColumn("p", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dist"),
              col("p").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** The broadcast-join assignment shape (see [[qEmbKmeansJoined]]):
    * identical init, updates, and arithmetic — only the arg-min moves
    * from projection literals to `min(struct(d, c_id))` over the ×k
    * candidate rows of a crossJoin against the broadcast centroid
    * table. Distances use the same array-order fold, so assignments
    * (and therefore every centroid) are bit-identical to [[kmeans]]. */
  private[graft] def kmeansJoined(embeddings: DataFrame, k: Int,
                                  iters: Int): DataFrame =
    kmeansJoinedWithStats(embeddings, k, iters)._1

  /** [[kmeansJoined]]'s core, NO-COLLECT end to end — the large-k
    * regime's requirement: at k ≈ √n the model is √n·dim rows, too
    * big to funnel through the plan every iteration as literals (the
    * literal shape's projection holds k distance folds and its
    * analysis cost grows with k; this shape's plan is CONSTANT-size —
    * the model is broadcast DATA). Centroids stay a DataFrame
    * throughout; the driver never deserializes the model into Scala
    * objects (the broadcast exchange ships the same bytes either way).
    *
    * Assignment is MAP-ONLY, like the literal shape: the k-row
    * centroid frame is rolled into ONE array row (`collect_list` of
    * (c_id, c_vec) structs, sorted for determinism), broadcast, and
    * the arg-min is an array HOF over that column — `array_min` of
    * (dist, c_id) structs, lexicographic, so min distance wins and
    * ties break to the lower c_id: the identical contract, with zero
    * exchanges between the corpus scan and the cluster id. (The r9
    * shape expanded n·k candidate rows and re-grouped by vec_id — a
    * full corpus shuffle per pass that this shape simply doesn't have.)
    *
    * The update is the same posexplode → per-(cluster, pos)
    * distributed avg (fully codegen'd; a typed elementwise-sum
    * Aggregator was tried and measured SLOWER — per-row Seq[Double]
    * decoding boxes every element, where posexplode + avg stays in
    * Tungsten end to end), reassembled to arrays by a sorted
    * collect_list PER CLUSTER, rounded with the identical
    * floor(x·10⁴+0.5)/10⁴.
    * The Lloyd fixed-point test is FUSED into the update job with NO
    * join: the next-centroid rows crossJoin the SAME one-row broadcast
    * model the assignment used (ReuseExchange — built once per pass),
    * and `moved` is an array lookup of the previous coords by c_id —
    * array equality on the ROUNDED coords, the exact [[converged]]
    * contract. A cluster that LOST every member leaves no next row to
    * carry a verdict, so the one driver-read action aggregates
    * (max(moved), count(*), prev model size) and the stop also
    * requires count == prev size. (The only case that slips the
    * row-wise check — next EMPTY while prev wasn't — needs an empty
    * corpus, where stopping early is itself the fixed point: empty
    * centroids reproduce empty centroids.) Each Lloyd pass is exactly
    * one job plus its tiny broadcast build.
    * The frame is a NON-eager localCheckpoint: lineage truncates at
    * plan-build time (each iteration's plan embeds its predecessor
    * twice — assignment and convergence lookup — so without truncation
    * the tree doubles per pass), while materialization still waits
    * for the fused action.
    * Returns the executed-iteration count for ConvergenceSpec. */
  private[graft] def kmeansJoinedWithStats(embeddings: DataFrame, k: Int,
                                           iters: Int): (DataFrame, Int) = {
    val emb = prepared(embeddings)
    val (cents, ran) = kmeansJoinedFit(emb, k, iters)
    (kmeansJoinedAssign(emb, cents), ran)
  }

  /** One-row broadcast model of a centroid frame (sorted struct
    * array — the determinism contract of the joined shape). */
  private def joinedModelOf(c: DataFrame): DataFrame =
    c.agg(sort_array(collect_list(struct(col("c_id"),
      col("c_vec")))).as("cs"))

  /** Assignment of a prepared (vec_id, v) frame against a broadcast
    * one-row model — map-only; see [[kmeansJoinedWithStats]]'s
    * contract notes. */
  private def joinedAssigned(emb: DataFrame, model: DataFrame): DataFrame =
    emb.crossJoin(broadcast(model))
      // min over structs is lexicographic: min distance first, ties
      // to the lower c_id — the same contract as the literal shape.
      // An empty model yields array_min(null-free empty) = null:
      // filtered, so an empty centroid set assigns nothing (the
      // empty-crossJoin semantics of the r9 shape).
      .withColumn("best", array_min(transform(col("cs"), cEl =>
        struct(sqDistCols(col("v"), cEl.getField("c_vec")).as("d"),
               cEl.getField("c_id").as("c_id")))))
      .where(col("best").isNotNull)
      .select(col("vec_id"), col("v"), col("best"))

  /** Final (vec_id, cluster, dist) projection under a fitted joined
    * centroid frame. */
  private def kmeansJoinedAssign(emb: DataFrame, cents: DataFrame): DataFrame =
    joinedAssigned(emb, joinedModelOf(cents)).select(
        col("vec_id"),
        col("best.c_id").cast("long").as("cluster"),
        Text.roundPortable(col("best.d"), Scale).as("dist"))
      .orderBy("vec_id")

  /** The joined-shape Lloyd FIT alone: returns the converged centroid
    * FRAME (k rows, lineage-truncated — the model stays DATA, never
    * deserialized driver-side) plus the executed iteration count.
    * [[kmeansJoinedModelFor]] memoizes the frame per session. */
  private[graft] def kmeansJoinedFit(emb: DataFrame, k: Int,
                                     iters: Int): (DataFrame, Int) = {
    var cents = emb.where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("c_id"),
        transform(col("v"), x => Text.roundPortable(x, Scale)).as("c_vec"))
      // k rows: collapse to one partition so every later read of the
      // checkpointed model is a single task, not 32 empty ones
      .coalesce(1)
      .localCheckpoint(eager = false)
    var ran = 0
    var done = false
    while (ran < iters && !done) {
      val model = joinedModelOf(cents)
      val stepped = joinedAssigned(emb, model)
        .select(col("best.c_id").as("cluster"),
          posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy("cluster", "pos")
        .agg(avg("val").as("mv"))
        .groupBy("cluster")
        // pos is unique per cluster, so the struct sort is a total
        // order and the rebuilt array is coordinate-exact
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          s => Text.roundPortable(s.getField("mv"), Scale)).as("c_vec"))
        .select(col("cluster").as("c_id"), col("c_vec"))
        // convergence lookup against the SAME broadcast model the
        // assignment used (ReuseExchange): every next c_id came out of
        // cs, so the element_at of the filtered singleton never nulls
        .crossJoin(broadcast(model))
        .select(col("c_id"), col("c_vec"),
          (col("c_vec") =!= element_at(filter(col("cs"),
             e => e.getField("c_id") === col("c_id")), 1)
             .getField("c_vec")).as("moved"),
          size(col("cs")).as("prev_k"))
        .coalesce(1)
        .localCheckpoint(eager = false)
      // the one action of the iteration: materializes the checkpoint
      // and reads back the fixed-point verdict (the coalesces cover
      // the degenerate empty frame — see the empty-corpus note above)
      val verdict = stepped.agg(
          coalesce(max(col("moved")), lit(false)).as("any_moved"),
          count(lit(1)).as("next_k"),
          coalesce(first(col("prev_k")), lit(0)).cast("long").as("pk"))
        .head
      done = !verdict.getBoolean(0) && verdict.getLong(1) == verdict.getLong(2)
      cents = stepped.select(col("c_id"), col("c_vec"))
      ran += 1
    }
    (cents, ran)
  }
}
