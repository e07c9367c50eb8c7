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

  /** L2-normalized copy given a PRE-BOUND norm column — the lambda
    * reads an O(1) reference. An inline `l2Norm(v)` captured in the
    * lambda would be re-evaluated per ELEMENT (O(d²) per row; the
    * SQ8 recon paid 4.8× for the same mistake — SCALING.md). */
  def l2Normalize(v: Column, n: Column): Column =
    transform(v, x => when(n === 0.0, 0.0).otherwise(x / n))

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
        abs(lit(1.0) - l2Norm(l2Normalize(col("e"), col("norm")))))
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

  /** SQ8 code array: round((x − min)/step) clamped to [0, 255],
    * all-zero for constant vectors. Takes PRE-BOUND min/max/step
    * columns: an expression captured inside a `transform` lambda is
    * re-evaluated per ELEMENT, so an inline `array_min(v)` would make
    * each row O(d²) interpreted work (measured: the first sim_ivf_sq8
    * cut ran 2.2 s vs sim_ivf's 0.3 s at sf0.1 from exactly this —
    * ~16k element-ops per 64-dim row). Callers project min/max/step
    * once per row and the lambdas read O(1) references. */
  private[graft] def sq8CodesWith(v: Column, vmin: Column, vmax: Column,
                                  scl: Column): Column =
    when(vmax > vmin,
        transform(v, x => least(lit(255.0),
          greatest(lit(0.0), floor((x - vmin) / scl + lit(0.5)))).cast("long")))
      .otherwise(transform(v, _ => lit(0L)))

  /** Dequantized copy: min + code·step — what an SQ8 index actually
    * scores against at search time. Same pre-bound-column contract as
    * [[sq8CodesWith]]. */
  private[graft] def sq8ReconWith(v: Column, vmin: Column, vmax: Column,
                                  scl: Column): Column =
    transform(sq8CodesWith(v, vmin, vmax, scl),
      c => vmin + c.cast("double") * scl)

  /** Core over a prepared (vec_id, v: array<double>) frame. The
    * range/step are projected ONCE per row before the lambdas use
    * them (the [[sq8CodesWith]] contract). */
  private[graft] def quantizeSq8(emb: DataFrame): DataFrame =
    emb
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("scl", (col("vmax") - col("vmin")) / lit(255.0))
      .withColumn("codes",
        sq8CodesWith(col("v"), col("vmin"), col("vmax"), col("scl")))
      .select(
        col("vec_id"),
        Text.roundPortable(col("vmin"), 4).as("qmin"),
        Text.roundPortable(col("vmax"), 4).as("qmax"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        Text.roundPortable(
          aggregate(zip_with(col("v"), col("codes"), (x, c) => {
              val err = x - (col("vmin") + c * col("scl"))
              err * err
            }), lit(0.0), (a, d) => a + d) / size(col("v")),
          8).as("recon_mse"))
      .orderBy("vec_id")

  private val RpDims = 16

  /** Sparse random projection (Achlioptas-style ±1 signs), 64 → 16
    * dims: y_j = Σ_i v_i·s_ji / √16 with s_ji = ±1 drawn from
    * md5("rp|j|i") — deterministic, so the DuckDB oracle replays the
    * identical matrix. The Johnson–Lindenstrauss preprocessing step a
    * 100 TB vector pipeline runs before IVF/clustering when the raw
    * dimension is the cost driver: distances are preserved within
    * (1±ε) while index memory and every downstream kernel shrink 4×.
    *
    * The sign matrix is built DRIVER-side (16×64 ints — model state,
    * like the k-means centroids) and rides into the projection as
    * literals; the corpus-side cost is a pure per-row fold, no md5
    * per element, no shuffle (the oracle pays the per-element md5
    * instead — correctness contract, not the production plan).
    * Output is long-format (vec_id, dim, val) so the gate hashes
    * scalars, not float-array renderings. */
  def qEmbProjectRp(spark: SparkSession, dir: String): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, i: Int): Double = {
      val hex = md.digest(s"rp|$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1.0 else -1.0
    }
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = (0 until RpDims).map { j =>
      val signs = Array.tabulate(64)(i => sign(j, i))
      aggregate(zip_with(col("v"), typedlit(signs), (x, s) => x * s),
        lit(0.0), (acc, t) => acc + t) / math.sqrt(RpDims)
    }
    emb.select(col("vec_id"),
        posexplode(array(dims: _*)).as(Seq("dim", "val")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        Text.roundPortable(col("val"), 4).as("val"))
      .orderBy("vec_id", "dim")
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
