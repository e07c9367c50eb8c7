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

/** Two-level coarse-quantizer assignment — the hierarchical twin of
  * [[NearestCells]] for LARGE quantizers. A flat argmax is
  * O(c·dim)/row; with c = √n cells that is O(√n·dim)/row — fine at
  * thousands of cells, a per-row scan of ~10⁵ centroids at a 10¹⁰
  * corpus. Here the c centroids are grouped under ⌈√c⌉ SUPER-cells
  * (the first ⌈√c⌉ centroids, each centroid assigned to its nearest —
  * the same deterministic "first vectors are the model" convention the
  * quantizer itself uses); a row scores the ⌈√c⌉ super-centroids,
  * keeps its `pSuper` nearest, and scores ONLY their member cells:
  * ~(√c + pSuper·√c)·dim ≈ O(n^¼·dim)/row instead of O(√n·dim).
  *
  * `pSuper` is the exactness dial (the assignment-level analogue of
  * the search-level nprobe): a row whose true nearest cell sits in an
  * unprobed super-cell gets its second-best cell instead.
  * NearestCellsSpec pins EXACT row-for-row equality with the flat
  * expression on every fixture scale plus replicated corpora at the
  * shipped `pSuperFor` setting — the oracle gates then re-prove it
  * end-to-end (same cells ⇒ same candidate sets ⇒ same rows).
  *
  * Member lists are visited in globally ascending centroid-id order
  * (a pSuper-way merge on the per-super ascending lists), so the
  * strict-`>` insertion keeps the lower id on similarity ties —
  * bit-identical tie semantics to the flat scan, independent of which
  * supers were probed. Per-pair arithmetic is the same dot/na/nb loop
  * as [[NearestCells]] / [[CosineSimilarity]].
  */
case class NearestCellsTwoLevel(child: Expression,
                                superVecs: Array[Array[Double]],
                                memberIds: Array[Array[Long]],
                                memberVecs: Array[Array[Array[Double]]],
                                pSuper: Int, keep: Int)
    extends UnaryExpression {

  require(superVecs.nonEmpty && superVecs.length == memberIds.length &&
    memberIds.length == memberVecs.length,
    s"super-cells (${superVecs.length}) and member lists must align")
  require(pSuper >= 1 && keep >= 1, s"pSuper/keep must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells_2level"

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
    def simTo(cv: Array[Double]): Double = {
      val n = math.min(nv, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
        val y = cv(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    // level 1: top-pSuper super-cells (strict > keeps lower index on
    // ties — supers are in index order)
    val nS = superVecs.length
    val pS = math.min(pSuper, nS)
    val sSims = new Array[Double](pS)
    val sIdx = new Array[Int](pS)
    var mS = 0
    var s = 0
    while (s < nS) {
      val sim = simTo(superVecs(s))
      var pos = mS
      while (pos > 0 && sim > sSims(pos - 1)) pos -= 1
      if (pos < pS) {
        val end = math.min(mS, pS - 1)
        var t = end
        while (t > pos) { sSims(t) = sSims(t - 1); sIdx(t) = sIdx(t - 1); t -= 1 }
        sSims(pos) = sim; sIdx(pos) = s
        if (mS < pS) mS += 1
      }
      s += 1
    }
    // level 2: pS-way merge over the selected supers' ascending member
    // lists, scoring in globally ascending id order
    val k = keep
    val sims = new Array[Double](k)
    val ids = new Array[Long](k)
    var m = 0
    val ptr = new Array[Int](mS)
    var remaining = 0
    var t0 = 0
    while (t0 < mS) { remaining += memberIds(sIdx(t0)).length; t0 += 1 }
    while (remaining > 0) {
      var best = -1
      var bestId = Long.MaxValue
      var t = 0
      while (t < mS) {
        val li = sIdx(t)
        if (ptr(t) < memberIds(li).length && memberIds(li)(ptr(t)) < bestId) {
          bestId = memberIds(li)(ptr(t)); best = t
        }
        t += 1
      }
      val li = sIdx(best)
      val sim = simTo(memberVecs(li)(ptr(best)))
      ptr(best) += 1; remaining -= 1
      var pos = m
      while (pos > 0 && sim > sims(pos - 1)) pos -= 1
      if (pos < k) {
        val end = math.min(m, k - 1)
        var u = end
        while (u > pos) { sims(u) = sims(u - 1); ids(u) = ids(u - 1); u -= 1 }
        sims(pos) = sim; ids(pos) = bestId
        if (m < k) m += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sVecsRef = ctx.addReferenceObj("superVecs", superVecs, "double[][]")
    val mIdsRef = ctx.addReferenceObj("memberIds", memberIds, "long[][]")
    val mVecsRef = ctx.addReferenceObj("memberVecs", memberVecs, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val nS = superVecs.length
      val pS = math.min(pSuper, nS)
      // one shared scoring routine via a private method on the
      // generated class keeps the two loops from duplicating the
      // cosine kernel; addNewFunction may qualify the name (inner
      // class spill) — call through the returned reference
      val simFnName = ctx.freshName("simTo")
      val simFn = ctx.addNewFunction(simFnName,
        s"""
           |private double $simFnName(org.apache.spark.sql.catalyst.util.ArrayData v, double[] cv, int nv) {
           |  int n = java.lang.Math.min(nv, cv.length);
           |  double dot = 0.0; double na = 0.0; double nb = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    double x = ${if (isDouble) "v.getDouble(i)" else "(double) v.getFloat(i)"};
           |    double y = cv[i];
           |    dot += x * y; na += x * x; nb += y * y;
           |  }
           |  double denom = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb);
           |  return (denom == 0.0) ? 0.0 : dot / denom;
           |}
         """.stripMargin)
      val nvv = ctx.freshName("nvv")
      val sSims = ctx.freshName("sSims"); val sIdx = ctx.freshName("sIdx")
      val mS = ctx.freshName("mS"); val sim = ctx.freshName("sim")
      val pos = ctx.freshName("pos"); val end = ctx.freshName("end")
      val sims = ctx.freshName("sims"); val ids = ctx.freshName("ids")
      val m = ctx.freshName("m"); val ptr = ctx.freshName("ptr")
      val remaining = ctx.freshName("remaining")
      val best = ctx.freshName("best"); val bestId = ctx.freshName("bestId")
      val li = ctx.freshName("li")
      s"""
         |int $nvv = $v.numElements();
         |double[] $sSims = new double[$pS];
         |int[] $sIdx = new int[$pS];
         |int $mS = 0;
         |for (int s = 0; s < $nS; s++) {
         |  double $sim = $simFn($v, $sVecsRef[s], $nvv);
         |  int $pos = $mS;
         |  while ($pos > 0 && $sim > $sSims[$pos - 1]) $pos--;
         |  if ($pos < $pS) {
         |    int $end = java.lang.Math.min($mS, $pS - 1);
         |    for (int t = $end; t > $pos; t--) {
         |      $sSims[t] = $sSims[t - 1]; $sIdx[t] = $sIdx[t - 1];
         |    }
         |    $sSims[$pos] = $sim; $sIdx[$pos] = s;
         |    if ($mS < $pS) $mS++;
         |  }
         |}
         |double[] $sims = new double[$keep];
         |long[] $ids = new long[$keep];
         |int $m = 0;
         |int[] $ptr = new int[$mS];
         |int $remaining = 0;
         |for (int t = 0; t < $mS; t++) $remaining += $mIdsRef[$sIdx[t]].length;
         |while ($remaining > 0) {
         |  int $best = -1;
         |  long $bestId = Long.MAX_VALUE;
         |  for (int t = 0; t < $mS; t++) {
         |    int $li = $sIdx[t];
         |    if ($ptr[t] < $mIdsRef[$li].length && $mIdsRef[$li][$ptr[t]] < $bestId) {
         |      $bestId = $mIdsRef[$li][$ptr[t]]; $best = t;
         |    }
         |  }
         |  double $sim = $simFn($v, $mVecsRef[$sIdx[$best]][$ptr[$best]], $nvv);
         |  $ptr[$best]++; $remaining--;
         |  int $pos = $m;
         |  while ($pos > 0 && $sim > $sims[$pos - 1]) $pos--;
         |  if ($pos < $keep) {
         |    int $end = java.lang.Math.min($m, $keep - 1);
         |    for (int u = $end; u > $pos; u--) {
         |      $sims[u] = $sims[u - 1]; $ids[u] = $ids[u - 1];
         |    }
         |    $sims[$pos] = $sim; $ids[$pos] = $bestId;
         |    if ($m < $keep) $m++;
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

  /** Probed super-cells for the two-level variant: max(2, ⌈c^¼⌉) —
    * grows as the fourth root, so the probed fraction of the space
    * keeps SHRINKING (at c = 10⁵ cells: 18 of 317 supers ≈ 6 % of
    * centroids scored per row) while the absolute probe count rises.
    * NOTE the two-level assignment is an approximation of the flat
    * argmax, and with the deterministic first-k "quantizer" (arbitrary
    * corpus vectors — untrained, so members are DIFFUSE around their
    * super) it deviates materially: measured 97/500 changed cells at
    * c=23, pSuper=3 on the sf0.001 fixtures. That is why the flat and
    * two-level paths are SEPARATE gated queries with separate oracles
    * (each oracle unrolls its own algorithm), not one silently
    * dispatched path — a dispatch would have flipped every existing
    * IVF gate's hashes. */
  def pSuperFor(numCells: Int): Int =
    math.max(2, math.ceil(math.pow(numCells.toDouble, 0.25)).toInt)

  /** Column form over a driver-collected quantizer: `(id, vector)`
    * pairs in any order (sorted here — ascending ids are the tie-break
    * precondition). An EMPTY quantizer (empty corpus slice,
    * numCentroids = 0) yields an empty-array literal — callers that
    * explode it get zero rows, the same semantics the old
    * crossJoin+window formulation had, instead of a plan-build
    * failure. Always the flat exact scan — the two-level
    * approximation is opted into per query ([[nearestCellsTwoLevel]]),
    * never silently. */
  def nearestCells(vec: Column, cents: Seq[(Long, Array[Double])],
                   keep: Int): Column =
    if (cents.isEmpty)
      org.apache.spark.sql.functions.lit(Array.empty[Long])
    else nearestCellsFlat(vec, cents, keep)

  /** The flat O(cells·dim)/row scan, callable directly (specs compare
    * the two paths row for row). */
  def nearestCellsFlat(vec: Column, cents: Seq[(Long, Array[Double])],
                       keep: Int): Column = {
    val sorted = cents.sortBy(_._1)
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, keep))
  }

  /** The hierarchical path at an explicit `pSuper` (specs sweep it). */
  def nearestCellsTwoLevel(vec: Column, cents: Seq[(Long, Array[Double])],
                           keep: Int, pSuper: Int): Column = {
    val (superVecs, memberIds, memberVecs) = twoLevelModel(cents)
    ColumnBridge.column(NearestCellsTwoLevel(ColumnBridge.expression(vec),
      superVecs, memberIds, memberVecs, pSuper, keep))
  }

  /** Driver-side super-cell construction: the first ⌈√c⌉ centroids
    * (by id) are the super-centroids; every centroid joins its
    * nearest super-centroid (cosine, ties to the lower super index —
    * the same arithmetic and tie rule as the expressions). Member
    * lists keep ascending id order, the merge precondition. Cost:
    * c·√c·dim driver flops — at c = 10⁵ and dim 64 ≈ 2·10⁹ flops
    * once per quantizer, driver-side model prep of the same order as
    * collecting the centroids themselves. */
  private[graft] def twoLevelModel(cents: Seq[(Long, Array[Double])])
      : (Array[Array[Double]], Array[Array[Long]], Array[Array[Array[Double]]]) = {
    val sorted = cents.sortBy(_._1).toArray
    val c = sorted.length
    val nSuper = math.ceil(math.sqrt(c.toDouble)).toInt
    val supers = sorted.take(nSuper).map(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val members = Array.fill(nSuper)(Vector.newBuilder[Int])
    var j = 0
    while (j < c) {
      var bestS = 0; var bestSim = Double.NegativeInfinity
      var s = 0
      while (s < nSuper) {
        val sim = cos(sorted(j)._2, supers(s))
        if (sim > bestSim) { bestSim = sim; bestS = s }
        s += 1
      }
      members(bestS) += j
      j += 1
    }
    val memberIdx = members.map(_.result())
    val memberIds = memberIdx.map(_.map(i => sorted(i)._1).toArray)
    val memberVecs = memberIdx.map(_.map(i => sorted(i)._2).toArray)
    (supers, memberIds, memberVecs)
  }
}
