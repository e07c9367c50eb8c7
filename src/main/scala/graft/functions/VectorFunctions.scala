package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{aggregate, lit, sqrt, zip_with}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two numeric-array columns (float or
  * double elements, independently per side — the SQ8 path scores a
  * double-array reconstruction against a float-array query).
  *
  * A Scala UDF would deserialize each array to a Scala Seq per row;
  * the higher-order-function composition (see [[cosineViaHof]]) is
  * interpreted per element. This expression runs one tight primitive
  * loop over the unsafe array data and participates in whole-stage
  * codegen, which is what you want when scoring billions of pairs.
  * Accumulation is in double regardless of input float width; the
  * element accessor is resolved per side from the child's type at
  * plan time, so the generated loop stays branch-free.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // reject bad inputs at ANALYSIS time: without this an array<int>
  // through the SQL-registered function surfaces as a mid-job
  // eval/codegen failure instead of an AnalysisException
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkFloatArrays(prettyName, left, right)

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case t => throw new IllegalArgumentException(
      s"cosine_similarity expects array<float|double>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (da, db) = (isDouble(left), isDouble(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (da) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (db) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      def get(arr: String, dbl: Boolean): String =
        if (dbl) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, isDouble(left))};
         |  double $y = ${get(b, isDouble(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared Euclidean distance — the k-means assignment kernel.
  * Same motivation and contract as [[CosineSimilarity]]: the HOF form
  * (`aggregate(zip_with(v, c, (x,y) => (x-y)²), 0.0, +)`) is
  * interpreted per element, and the joined k-means assignment
  * evaluates the distance on n·k candidate rows. Accumulation is a
  * left-to-right double fold in array order — bit-identical to the
  * HOF twin and to the oracle's `list_sum(list_transform(...))`, so
  * swapping the kernel cannot move a single assignment. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_distance"

  // analysis-time rejection — same contract as CosineSimilarity
  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkFloatArrays(prettyName, left, right)

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case t => throw new IllegalArgumentException(
      s"squared_distance expects array<float|double>, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (da, db) = (isDouble(left), isDouble(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val x = if (da) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (db) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      def get(arr: String, dbl: Boolean): String =
        if (dbl) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, isDouble(left))} - ${get(b, isDouble(right))};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared analysis-time input check for the vector kernels: both
    * sides must be float or double arrays (independently per side —
    * the SQ8 path scores double reconstructions against float
    * queries). */
  private[functions] def checkFloatArrays(fn: String, left: Expression,
                                          right: Expression): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<float|double> arguments, got " +
      s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Column form of the native expression. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column form of the native squared-distance kernel. */
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Built-in-composition twin of [[sqDist]] — the no-custom-code
    * fallback and the cross-check in tests. */
  def sqDistViaHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Built-in-composition equivalent (zip_with + aggregate) — kept as
    * the no-custom-code fallback and as a cross-check in tests. */
  def cosineViaHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na  = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
    val nb  = aggregate(b, lit(0.0), (acc, v) => acc + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }
}
