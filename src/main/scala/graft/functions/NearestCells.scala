package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Map-only coarse-quantizer assignment: the `keep` nearest centroids
  * of a vector, by cosine similarity against a driver-held centroid
  * MATRIX — ties broken to the lower centroid id, exactly the
  * `Window.partitionBy(vec_id).orderBy(desc(c_sim), c_id)` contract of
  * the crossJoin+window formulation this replaces.
  *
  * Why an expression and not a join: the quantizer is MODEL state
  * (√n centroids × dim doubles — ~50 MB at 10¹⁰ vectors), while the
  * corpus is data. Scoring the corpus against it as a crossJoin +
  * per-vec_id window shuffles n·c scored rows before any candidate
  * generation starts; carried in the projection it is a per-row
  * argmax — ZERO exchanges between the corpus scan and the bucket id,
  * so the bucket equi-join becomes the only corpus-wide shuffle of
  * every IVF path. The matrix rides into tasks as a codegen reference
  * object (one broadcast of the task binary per stage — the same
  * transport a broadcast-hash join would use for the same bytes).
  *
  * Per-pair arithmetic is bit-identical to [[CosineSimilarity]]: one
  * double loop in array order accumulating dot/na/nb, `0.0` on a zero
  * denominator. Identical bits in → identical ranks out, which is what
  * lets the ten sim and embedding-dedup oracle gates stay hash-green
  * across the plan change.
  *
  * Output: `array<long>` of centroid ids, best first, length
  * `min(keep, numCentroids)`. Centroid ids must be strictly ascending
  * (the companion sorts); insertion uses strict `>`, so equal
  * similarities keep the earlier = lower id.
  */
case class NearestCells(child: Expression, cIds: Array[Long],
                        cVecs: Array[Array[Double]], keep: Int)
    extends UnaryExpression {

  require(cIds.length == cVecs.length && cIds.nonEmpty,
    s"centroid ids (${cIds.length}) and vectors (${cVecs.length}) must align")
  require(keep >= 1, s"keep must be >= 1, got $keep")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float|double> vector, got ${t.catalogString}")
  }

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    val c = cVecs.length
    val k = math.min(keep, c)
    val sims = new Array[Double](k)
    val ids = new Array[Long](k)
    var m = 0
    var j = 0
    while (j < c) {
      val cv = cVecs(j)
      val n = math.min(nv, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
        val y = cv(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      // sorted-desc insertion; strict > keeps the earlier (lower) id
      // on ties because ids are ascending
      var pos = m
      while (pos > 0 && sim > sims(pos - 1)) pos -= 1
      if (pos < k) {
        val end = math.min(m, k - 1)
        var t = end
        while (t > pos) { sims(t) = sims(t - 1); ids(t) = ids(t - 1); t -= 1 }
        sims(pos) = sim; ids(pos) = cIds(j)
        if (m < k) m += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", cIds, "long[]")
    val vecsRef = ctx.addReferenceObj("cellVecs", cVecs, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val k = math.min(keep, cVecs.length)
      val nv = ctx.freshName("nv"); val j = ctx.freshName("j")
      val cv = ctx.freshName("cv"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val denom = ctx.freshName("denom"); val sim = ctx.freshName("sim")
      val sims = ctx.freshName("sims"); val ids = ctx.freshName("ids")
      val m = ctx.freshName("m"); val pos = ctx.freshName("pos")
      val end = ctx.freshName("end"); val t = ctx.freshName("t")
      val get = if (isDouble) s"$v.getDouble($i)" else s"(double) $v.getFloat($i)"
      s"""
         |int $nv = $v.numElements();
         |double[] $sims = new double[$k];
         |long[] $ids = new long[$k];
         |int $m = 0;
         |for (int $j = 0; $j < ${cVecs.length}; $j++) {
         |  double[] $cv = $vecsRef[$j];
         |  int $n = java.lang.Math.min($nv, $cv.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $get;
         |    double $y = $cv[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  double $sim = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |  int $pos = $m;
         |  while ($pos > 0 && $sim > $sims[$pos - 1]) $pos--;
         |  if ($pos < $k) {
         |    int $end = java.lang.Math.min($m, $k - 1);
         |    for (int $t = $end; $t > $pos; $t--) {
         |      $sims[$t] = $sims[$t - 1]; $ids[$t] = $ids[$t - 1];
         |    }
         |    $sims[$pos] = $sim; $ids[$pos] = $idsRef[$j];
         |    if ($m < $k) $m++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($ids, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCells {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form over a driver-collected quantizer: `(id, vector)`
    * pairs in any order (sorted here — ascending ids are the tie-break
    * precondition). An EMPTY quantizer (empty corpus slice,
    * numCentroids = 0) yields an empty-array literal — callers that
    * explode it get zero rows, the same semantics the old
    * crossJoin+window formulation had, instead of a plan-build
    * failure. */
  def nearestCells(vec: Column, cents: Seq[(Long, Array[Double])],
                   keep: Int): Column =
    if (cents.isEmpty)
      org.apache.spark.sql.functions.lit(Array.empty[Long])
    else {
      val sorted = cents.sortBy(_._1)
      ColumnBridge.column(NearestCells(ColumnBridge.expression(vec),
        sorted.map(_._1).toArray, sorted.map(_._2).toArray, keep))
    }
}
