package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.cosine

/** Similarity search over the `embeddings` table (64-dim float
  * vectors). Brute-force cosine top-k as the exact baseline; an
  * IVF-style bucketed variant as the scale path (centroid blocking
  * turns the all-pairs scan into per-bucket scans). Scoring runs the
  * native [[graft.functions.CosineSimilarity]] expression inside
  * whole-stage codegen.
  */
object Similarity {

  private val NumQueries = 10   // vec_id < 10 are the query vectors
  private val TopK = 5
  private val NumCentroids = 8  // IVF "training": first 8 vectors
  private val NearDupThreshold = 0.45

  /** Exact top-k nearest neighbors for each query vector.
    * Broadcast the (tiny) query set against the corpus — one scan,
    * no shuffle of the corpus; per-query ranking is a window over
    * k·|queries| rows at most after the rank filter. */
  def qSimBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("embedding")))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("q_id", "rank")
  }

  /** IVF-style ANN: deterministic "centroids" (first NumCentroids
    * vectors), every vector assigned to its nearest centroid, and a
    * query only scans its own bucket. At scale the assignment is one
    * broadcast pass over the corpus and search cost drops by the
    * bucket fan-out; recall loss vs brute force is the usual IVF
    * trade (nprobe=1 here). */
  def qSimIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = emb.where(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("c_sim"), col("c_id"))
    val assigned = emb.crossJoin(broadcast(cent))
      .withColumn("c_sim", cosine(col("embedding"), col("c_vec")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("bucket"))
    val q = assigned.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
              col("bucket").as("q_bucket"))
    val wRank = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    assigned.join(q, col("bucket") === col("q_bucket") &&
                     col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("embedding")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("q_id", "rank")
  }

  /** IVF + SQ8: the standard compressed-index ANN recipe. Bucketing
    * is identical to [[qSimIvf]] (coarse assignment happens on the
    * raw vector at index-build time), but search scores the corpus
    * side on its SQ8 RECONSTRUCTION (min + code·step per coordinate,
    * [[Vectors.sq8Recon]]) while queries stay full-precision — the
    * memory contract of a real SQ8 index, where only codes + two
    * scalars per vector are resident. Reconstruction is a pure
    * per-row projection fused into the bucket scan (no join against
    * a codes table), and the mixed float×double scoring runs in the
    * same codegen'd [[graft.functions.CosineSimilarity]] loop.
    * Ranking shifts only where quantization error crosses a
    * neighbor gap — the recall cost of the 4× memory cut; the gate
    * hash-checks the full quantize→reconstruct→score→rank path. */
  def qSimIvfSq8(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cent = emb.where(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("c_sim"), col("c_id"))
    val assigned = emb.crossJoin(broadcast(cent))
      .withColumn("c_sim", cosine(col("embedding"), col("c_vec")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("bucket"))
    val corpus = assigned
      .withColumn("vd", col("embedding").cast("array<double>"))
      // range/step projected once per row — the sq8ReconWith contract
      // (an inline array_min inside the lambda is O(d²) per row)
      .withColumn("vmin", array_min(col("vd")))
      .withColumn("vmax", array_max(col("vd")))
      .withColumn("scl", (col("vmax") - col("vmin")) / lit(255.0))
      .withColumn("recon", Vectors.sq8ReconWith(
        col("vd"), col("vmin"), col("vmax"), col("scl")))
      .drop("vd", "vmin", "vmax", "scl")
    val q = assigned.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
              col("bucket").as("q_bucket"))
    val wRank = Window.partitionBy("q_id").orderBy(desc("sim"), col("vec_id"))
    corpus.join(q, col("bucket") === col("q_bucket") &&
                   col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("recon")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("q_id", "rank")
  }

  /** Corpora up to this size may use the exact all-pairs self-join;
    * beyond it the blocked path always runs (all-pairs is O(n²) in
    * the corpus — the one thing embedding dedup must never be at
    * 100 TB). Mirrors Dedup.DriverCcMaxEdges. */
  private[operators] val AllPairsMaxVectors = 10000L
  private val NumProbes = 2

  /** Exact all-pairs near-dup — the small-corpus oracle baseline
    * (private[graft]: ScaleProbe uses it as recall ground truth). */
  private[graft] def allPairsNearDup(emb: DataFrame): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .where(col("sim") >= NearDupThreshold)
  }

  /** IVF-blocked near-dup: every vector is assigned to its `nProbes`
    * nearest of `numCentroids` deterministic centroids, candidates
    * are pairs sharing a bucket (an equi-join on the bucket id — the
    * only corpus-wide shuffle), and candidates alone get the exact
    * cosine verify. Same candidate-generation/verify split as the
    * LSH text dedups. Recall is the IVF trade (multi-probe is the
    * dial; measured in SCALING.md) — the all-pairs formulation is
    * the exact-recall alternative, legal only under
    * [[AllPairsMaxVectors]]. */
  private[graft] def blockedNearDup(emb: DataFrame, numCentroids: Int,
                                    nProbes: Int): DataFrame = {
    val cent = emb.where(col("vec_id") < numCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("c_sim"), col("c_id"))
    val assigned = emb.crossJoin(broadcast(cent))
      .withColumn("c_sim", cosine(col("embedding"), col("c_vec")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") <= nProbes)
      .select(col("vec_id"), col("c_id").as("bucket"))
    val cands = assigned.as("a")
      .join(assigned.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val ea = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val eb = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    cands.join(ea, "id_a").join(eb, "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .where(col("sim") >= NearDupThreshold)
  }

  /** Embedding-cosine near-duplicate pairs, EXACT all-pairs — full
    * recall by construction, and the semantics its oracle gate
    * hash-checks at every size. O(n²) in the corpus, so it refuses
    * corpora above [[AllPairsMaxVectors]] with a pointer to the scale
    * operator instead of silently degrading recall under the same
    * name (a query named "exact" must never return approximate
    * results just because the input grew). */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // size guard from parquet FOOTER metadata — no job, no data scan
    // (round 4 paid a full count() scan per invocation here); early
    // exit means an over-bound corpus reads O(1) footers
    val n = Tables.parquetRowCount(spark, s"$dir/embeddings.parquet",
      stopAfter = AllPairsMaxVectors)
    require(n <= AllPairsMaxVectors,
      s"dedup_embedding is the exact all-pairs operator (O(n²)); corpus has " +
      s"≥$n > $AllPairsMaxVectors vectors. Use embeddingNearDupScaled / the " +
      s"dedup_embedding_blocked gate for the IVF-blocked scale path.")
    allPairsNearDup(emb)
      .select(col("id_a"), col("id_b"),
        graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
  }

  /** Centroid count for the scale path: √n (floored at the fixed-gate
    * count) keeps expected bucket size ~√n, so per-bucket pair
    * generation totals ~n^1.5 instead of the pinned config's ~n²/8. */
  private[graft] def scaledCentroids(n: Long): Int =
    math.max(NumCentroids, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** The scale API for embedding near-dup: IVF blocking with the
    * centroid count grown as √n, so bucket size stays ~√n and
    * per-bucket pair generation stays ~n^1.5 total rather than n².
    * Corpus size comes from parquet FOOTER metadata — building this
    * plan runs zero Spark jobs (the round-5 fix qDedupEmbedding got;
    * an emb.count() here cost a full scan per invocation). `nProbes`
    * is the recall/cost dial (each vector lands in its nProbes nearest
    * buckets; recall-vs-nprobe measured in SCALING.md), mirroring the
    * simhash banding dial. Approximate by construction; the
    * fixed-config variant is hash-gated as dedup_embedding_blocked,
    * this √n config as dedup_embedding_scaled. */
  def embeddingNearDupScaled(spark: SparkSession, dir: String,
                             nProbes: Int = NumProbes): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/embeddings.parquet")
    blockedNearDup(Tables.embeddings(spark, dir), scaledCentroids(n), nProbes)
  }

  /** The √n-centroid gate: same output shape as the blocked gate, but
    * the centroid count is derived from the corpus the way the scale
    * API actually does it — so the plan you'd run at 100× is the
    * hash-checked one, not just the oracle-pinned toy config. */
  def qDedupEmbeddingScaled(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupScaled(spark, dir)
      .select(col("id_a"), col("id_b"),
        graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")

  /** The blocked-path gate: IVF blocking forced with the fixed
    * (numCentroids=8, nProbes=2) configuration the DuckDB oracle
    * reproduces step for step — so the scale path itself is
    * hash-checked, exactly like dedup_clusters_dist forces the
    * distributed components path. */
  def qDedupEmbeddingBlocked(spark: SparkSession, dir: String): DataFrame =
    blockedNearDup(Tables.embeddings(spark, dir), NumCentroids, NumProbes)
      .select(col("id_a"), col("id_b"),
        graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
}
