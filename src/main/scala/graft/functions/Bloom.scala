package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a pre-built [[BloomFilter]] — the map-side
  * pre-filter for membership tests against a set too large to
  * broadcast as a hash relation (decontamination against a massive
  * eval-shingle index is the motivating case). One-sided by
  * construction: a `false` is definite, a `true` is verified by an
  * exact join downstream, so the operator's OUTPUT stays exact while
  * the shuffle carries only the candidates.
  *
  * An expression rather than a UDF for the usual reason (SimHash64,
  * CosineSimilarity precedents): this runs once per (doc, shingle)
  * row — the widest relation in the plan — and a UDF would box every
  * shingle through a Scala closure. Here the filter object rides into
  * generated code via `addReferenceObj` and the probe hashes the
  * UTF8String's bytes directly (`mightContainBinary` on UTF-8 bytes
  * is exactly what `putString`/`mightContainString` hash, without the
  * String round-trip).
  */
case class BloomMightContain(bloom: BloomFilter, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bloom {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: true iff `col`'s UTF-8 bytes might be in `bloom`. */
  def mightContain(bloom: BloomFilter, col: Column): Column =
    ColumnBridge.column(BloomMightContain(bloom, ColumnBridge.expression(col)))
}
