package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.immutable.TreeSet

/** Typed replacement of the reference's UserDefinedAggregateFunction
  * `group_concat_distinct` (reference: spark/product/
  * GroupConcatDistinctUDAF.java:18-124). The reference dedupes with
  * `String.contains` (buggy on substrings, e.g. "1:Beijing" vs
  * "11:Beijing"); we keep a sorted set, which is also deterministic —
  * output order doesn't depend on merge order, so results are stable
  * across partitionings and hash-comparable against a SQL oracle
  * (`string_agg(DISTINCT x, ',' ORDER BY x)`).
  *
  * Buffer is a TreeSet so partial aggregation (update) and merge are
  * both O(log n) per element; at scale the cardinality per group is
  * what bounds memory, same as collect_set.
  */
object GroupConcatDistinct extends Aggregator[String, TreeSet[String], String] {
  override def zero: TreeSet[String] = TreeSet.empty[String]
  override def reduce(b: TreeSet[String], a: String): TreeSet[String] =
    if (a == null) b else b + a
  override def merge(b1: TreeSet[String], b2: TreeSet[String]): TreeSet[String] =
    b1 ++ b2
  override def finish(r: TreeSet[String]): String = r.mkString(",")
  override def bufferEncoder: Encoder[TreeSet[String]] =
    Encoders.kryo[TreeSet[String]]
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: group_concat_distinct($"x"). */
  def apply(c: Column): Column = udaf(this).apply(c)
}
