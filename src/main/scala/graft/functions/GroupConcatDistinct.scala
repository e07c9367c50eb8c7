package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed replacement of the reference's UserDefinedAggregateFunction
  * `group_concat_distinct` (reference: spark/product/
  * GroupConcatDistinctUDAF.java:18-124). The reference dedupes with
  * `String.contains` (buggy on substrings, e.g. "1:Beijing" vs
  * "11:Beijing"); we dedupe with a real set and sort for determinism —
  * output doesn't depend on merge order, so results are stable across
  * partitionings and hash-comparable against a SQL oracle
  * (`string_agg(DISTINCT x, ',' ORDER BY x)`).
  *
  * The buffer is a plain Seq (Catalyst-native encoder, serialized as
  * an UnsafeArray) rather than a kryo-serialized set: appends are
  * O(1), dedupe+sort happen once in finish. Per-group buffer size is
  * bounded by group cardinality, same as collect_list.
  */
object GroupConcatDistinct extends Aggregator[String, Seq[String], String] {
  override def zero: Seq[String] = Vector.empty
  override def reduce(b: Seq[String], a: String): Seq[String] =
    if (a == null) b else b :+ a
  override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] = b1 ++ b2
  override def finish(r: Seq[String]): String = r.distinct.sorted.mkString(",")
  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: group_concat_distinct($"x"). */
  def apply(c: Column): Column = udaf(this).apply(c)
}
