package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-ORDER (Morton-curve) DATA LAYOUT — the multi-dimensional
  * clustering rule behind Delta/Iceberg `OPTIMIZE ZORDER BY`: bit-
  * interleave two sort dimensions into one key so that sorting by the
  * key co-locates rows that are close in EITHER dimension, and
  * min/max file statistics prune scans on BOTH predicate columns. A
  * plain (user, time) sort gives perfect pruning on user and none on
  * time; the z-curve gives √-grade pruning on each — the right trade
  * whenever two predicate shapes share one table, which at 100 TB is
  * the difference between scanning a stripe and scanning everything.
  *
  * Everything here is a pure Column composition (shift/mask/or chains
  * stay inside whole-stage codegen — no UDF): zValue interleaves the
  * low [[ZBits]] bits of each dimension; the gate reports the
  * per-CELL occupancy summary (cell = z >> 8, a 16×16 grid patch in
  * (x, y) space), which is exactly the statistic a layout optimizer
  * reads to size files. LayoutSpec writes a z-sorted parquet table
  * and reads the per-file footer ranges back to show both dimensions
  * prune, vs the one-dimensional sort where only the leading column
  * does.
  */
object Layout {

  /** Bits interleaved per dimension (z spans 2·ZBits = 62 bits —
    * the widest interleave a signed 64-bit z can hold without
    * touching the sign bit). Dimensions must be non-negative and
    * < 2³¹; bits above ZBits would alias distant rows into one cell
    * and silently void the pruning guarantee, which is why this is
    * 31 and not a "plenty for the fixture" 16 — the 10× probe
    * replicates user_id into the 10⁸–10⁹ range and a 16-bit
    * interleave would have run fully aliased there. */
  val ZBits = 31

  /** Morton interleave of the low [[ZBits]] bits of x and y:
    * bit i of x lands at 2i, bit i of y at 2i+1. Unrolled or-chain —
    * 2·[[ZBits]] shift/mask terms, all codegen'd. */
  def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      val xi = shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yi = shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xi.bitwiseOR(yi)
    }.reduce(_ bitwiseOR _)

  /** The same interleave as DuckDB SQL text (the oracle twin). */
  private[graft] def zValueSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Gate: z-order `events` on (user_id, hour-of-corpus) and report
    * per-cell occupancy — cell = z >> 8 (a 16×16 patch of the
    * (user, hour) grid): how many events, and the exact x/y bounding
    * box the cell's rows span. The bounding boxes ARE the min/max
    * stats a reader prunes on; CELL-bounded spans on both dimensions
    * (LayoutSpec pins ≤ 16) are what one-dimensional sorts cannot
    * give. One partial-agg shuffle on the cell key. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsNorm(spark, dir)
    // empty corpus ⇒ min is NULL ⇒ anchor at 0 (the summary is empty
    // regardless; the anchor only shifts y for occupied rows)
    val hour0Row = e.agg(min(col("ts_sec"))).head()
    val hour0 = if (hour0Row.isNullAt(0)) 0L else hour0Row.getLong(0)
    zCellSummary(
      e.select(col("event_id"), col("user_id").as("x"),
        ((col("ts_sec") - lit(hour0)) / lit(3600L)).cast("long").as("y")))
  }

  /** Per-cell occupancy summary of a prepared (event_id, x, y)
    * frame. */
  private[graft] def zCellSummary(xy: DataFrame): DataFrame =
    xy.withColumn("z", zValue(col("x"), col("y")))
      .withColumn("cell", shiftright(col("z"), 8))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_events"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .orderBy("cell")

  /** The z-sort itself, for the write path: range-partition then sort
    * by z so every output file covers one contiguous curve segment —
    * parquet footers then carry tight min/max for BOTH x and y.
    * Partition-count is the caller's file-sizing dial. */
  private[graft] def zSorted(xy: DataFrame, partitions: Int): DataFrame =
    xy.withColumn("z", zValue(col("x"), col("y")))
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
}
