package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout (q_zorder_layout): the oracle gate pins the cell
  * summary; this spec pins (1) the interleave math against a
  * reference implementation, (2) the cell-locality contract — every
  * z>>8 cell bounds BOTH dimensions by the 16×16 patch — and (3) the
  * point of the whole exercise: after a z-sorted write, EVERY file's
  * min/max range is tight on BOTH predicate columns (the stats a
  * reader prunes on), while a one-dimensional sort leaves the second
  * column's per-file range at ~full span (no pruning).
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def zRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zValue matches the reference interleave on a grid of cases") {
    val cases = for (x <- 0L to 40L by 7L; y <- 0L to 40L by 5L) yield (x, y)
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(x, y), s"($x,$y)")
    }
  }

  test("every z>>8 cell bounds both dimensions by its 16-wide patch") {
    val cells = Layout.qZorderLayout(spark, sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 15, s"cell ${r.getLong(0)} x-span")
      assert(r.getLong(5) - r.getLong(4) <= 15, s"cell ${r.getLong(0)} y-span")
    }
  }

  test("z-sorted files carry tight min/max on BOTH columns; an x-sort does not") {
    val e = Tables.eventsNorm(spark, sf)
    val h0 = e.agg(min(col("ts_sec"))).head().getLong(0)
    val xy = e.select(col("event_id"), col("user_id").as("x"),
      ((col("ts_sec") - lit(h0)) / lit(3600L)).cast("long").as("y"))
    val ySpan = xy.agg(max("y") - min("y")).head().getLong(0).toDouble

    def fileSpans(df: org.apache.spark.sql.DataFrame, path: String): Seq[(Long, Long)] = {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    }

    val zSpans = fileSpans(Layout.zSorted(xy, 8), "/tmp/graft_layout_z")
    val xSpans = fileSpans(
      xy.repartitionByRange(8, col("x")).sortWithinPartitions("x"),
      "/tmp/graft_layout_x")
    assert(zSpans.size > 1 && xSpans.size > 1)
    def medianY(s: Seq[(Long, Long)]) = s.map(_._2).sorted.apply(s.size / 2)
    // every z-file is prunable on y (range well under the full span);
    // the x-sorted files span ~everything on y — unprunable
    assert(medianY(zSpans) <= (ySpan / 2).toLong,
      s"z files median y-span ${medianY(zSpans)} vs full $ySpan")
    assert(medianY(xSpans) >= (ySpan * 0.9).toLong,
      s"x files median y-span ${medianY(xSpans)} vs full $ySpan")
  }
}
