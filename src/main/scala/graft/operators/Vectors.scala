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
