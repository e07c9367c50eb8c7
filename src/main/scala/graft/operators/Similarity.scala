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

  /** Embedding-cosine near-duplicate pairs. All-pairs here (the
    * corpus fits); the IVF/LSH bucketing above is the documented
    * scale path for the same semantics. */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .where(col("sim") >= NearDupThreshold)
      .select(col("id_a"), col("id_b"), graft.functions.Text.roundPortable(col("sim"), 4).as("sim"))
      .orderBy("id_a", "id_b")
  }
}
