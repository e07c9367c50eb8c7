package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Vector-column utilities over `embeddings` — the normalization /
  * norm-statistics layer under the similarity operators. Pure
  * higher-order Column expressions (no UDF); at scale these are
  * scalar projections fused into the scan.
  */
object Vectors {

  /** L2 norm of a float-array column (accumulated in double,
    * sequential order — reproducible in any engine). */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** L2-normalized copy of the vector. */
  def l2Normalize(v: Column): Column = {
    val n = l2Norm(v)
    transform(v, x => when(n === 0.0, 0.0).otherwise(x / n))
  }

  /** Norm statistics + verification that normalization yields unit
    * vectors: per label, count, mean raw norm, max |1 - ||norm(v)|| |
    * (the last column doubles as a correctness check — it must be
    * ~0 for every group). */
  def qVectorNorms(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      // cast once: float*float inside the lambda would round to
      // single precision; the oracle computes in double
      .withColumn("e", col("embedding").cast("array<double>"))
    emb
      .withColumn("norm", l2Norm(col("e")))
      .withColumn("unit_err",
        abs(lit(1.0) - l2Norm(l2Normalize(col("e")))))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           Text.roundPortable(avg("norm"), 4).as("avg_norm"),
           Text.roundPortable(max("norm"), 4).as("max_norm"),
           Text.roundPortable(max("unit_err"), 4).as("max_unit_err"))
      .orderBy("label")
  }

  /** Per-vector int8 scalar quantization (the SQ8 of the standard
    * IVF+SQ8 ANN recipe): codes_i = round((x_i − min)/scale) with
    * scale = (max − min)/255, clamped to [0, 255]. At 100 TB this is
    * the memory story for the similarity operators — a 64-dim float
    * vector (256 B) becomes 64 byte-codes + two doubles (~4×
    * smaller), which is the difference between an embedding index
    * that fits executor memory and one that doesn't. Map-only scalar
    * projection, no shuffle, fused into the scan.
    *
    * The gate pins vec_id, the (rounded) quantization range, the
    * integer code SUM (an exact checksum of all 64 codes — any
    * engine disagreement on any code breaks it), and the
    * reconstruction MSE. Constant vectors (max = min) quantize to
    * all-zero codes with zero error by the CASE guard. */
  def qEmbQuantizeSq8(spark: SparkSession, dir: String): DataFrame =
    quantizeSq8(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))

  /** SQ8 code array of a double-array column: round((x − min)/step)
    * clamped to [0, 255], all-zero for constant vectors. */
  private[graft] def sq8Codes(v: Column): Column = {
    val vmin = array_min(v)
    val vmax = array_max(v)
    val scl = (vmax - vmin) / lit(255.0)
    when(vmax > vmin,
        transform(v, x => least(lit(255.0),
          greatest(lit(0.0), floor((x - vmin) / scl + lit(0.5)))).cast("long")))
      .otherwise(transform(v, _ => lit(0L)))
  }

  /** Dequantized copy: min + code·step — what an SQ8 index actually
    * scores against at search time. */
  private[graft] def sq8Recon(v: Column): Column = {
    val vmin = array_min(v)
    val scl = (array_max(v) - vmin) / lit(255.0)
    transform(sq8Codes(v), c => vmin + c.cast("double") * scl)
  }

  /** Core over a prepared (vec_id, v: array<double>) frame. */
  private[graft] def quantizeSq8(emb: DataFrame): DataFrame = {
    val vmin = array_min(col("v"))
    val vmax = array_max(col("v"))
    val scl = (vmax - vmin) / lit(255.0)
    emb.withColumn("codes", sq8Codes(col("v")))
      .select(
        col("vec_id"),
        Text.roundPortable(vmin, 4).as("qmin"),
        Text.roundPortable(vmax, 4).as("qmax"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        Text.roundPortable(
          aggregate(zip_with(col("v"), col("codes"), (x, c) => {
              val err = x - (vmin + c * scl)
              err * err
            }), lit(0.0), (a, d) => a + d) / size(col("v")),
          8).as("recon_mse"))
      .orderBy("vec_id")
  }

  /** Fixed-width histogram of the events value column (binning
    * surface; floor-division bucketing is exact in both engines). */
  def qValueHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy((floor(col("value") / 20.0) * 20).cast("long").as("bucket_low"))
      .agg(count(lit(1)).as("n"),
           Text.roundPortable(avg("value"), 4).as("avg_value"))
      .orderBy("bucket_low")
  }
}
