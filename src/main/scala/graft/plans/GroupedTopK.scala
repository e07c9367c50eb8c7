package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.execution.SparkStrategy

/** Grouped top-k as a custom whole-operator plan (SURVEY §4 noted no
  * custom operator is *required*; this one exists because the
  * built-in formulation — `row_number().over(partitionBy(key).
  * orderBy(...)) <= k` — must fully SORT every key group, while a
  * bounded per-key heap is O(n log k) and keeps at most k rows per
  * key in memory. The physical plan mirrors partial/final
  * aggregation: a partial heap pass per input partition, one shuffle
  * clustered on the keys, then a final heap pass — so the shuffle
  * carries at most k·partitions rows per key, not the group.
  *
  * Ordering is an arbitrary lexicographic `SortOrder` sequence — the
  * kept rows are the k that sort FIRST under it (the rows
  * `row_number().over(orderBy(sortOrder)) <= k` would keep). The
  * comparator is Catalyst-codegen'd per task (`GenerateOrdering`),
  * the same machinery `TakeOrderedAndProject` uses, so any orderable
  * column type works: strings, dates, decimals, structs.
  */
case class GroupedTopK(keys: Seq[Expression], sortOrder: Seq[SortOrder],
                       k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

/** One heap pass: keep the k best rows per key seen in this
  * partition. `finalPass` adds the clustered-distribution requirement
  * that makes the result exact. */
case class GroupedTopKExec(keys: Seq[Expression], sortOrder: Seq[SortOrder],
                           k: Int, finalPass: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPass) Seq(ClusteredDistribution(keys))
    else Seq(UnspecifiedDistribution)

  // the heap pass drops rows but never moves them across partitions,
  // so the child's partitioning holds for the output. Without this
  // override the default UnknownPartitioning makes EnsureRequirements
  // re-shuffle a child that is ALREADY clustered on the keys (e.g. by
  // an upstream window/aggregate) — one redundant exchange per topk.
  // Output ORDERING is deliberately not propagated: heap emission
  // order is arbitrary.
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val limit = k
    val childOutput = child.output
    val boundSort = sortOrder.map(BindReferences.bindReference(_, childOutput))
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd lexicographic comparator, generated on the executor
      // (SortOrder expressions serialize; generated classes don't)
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(boundSort)
      // max-heap under `ord` (worst kept row at the root), so an
      // arriving row that sorts before the root evicts it.
      val worstFirst = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec =
    copy(child = c)
}

/** Plans GroupedTopK as final(partial(child)) — the exchange between
  * them is inserted by EnsureRequirements off the final pass's
  * required distribution. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(keys, sortOrder, k, child) =>
      GroupedTopKExec(keys, sortOrder, k, finalPass = true,
        GroupedTopKExec(keys, sortOrder, k, finalPass = false,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupedTopKApi {

  /** Generalized DataFrame entry: the top `k` rows per `keys` group
    * under the lexicographic ordering given by `sort` — each entry is
    * (column name, ascending?), with Spark's default null placement
    * (asc = nulls first, desc = nulls last). "Top" means the rows a
    * `row_number().over(partitionBy(keys).orderBy(sort)) <= k` window
    * would keep, computed with bounded heaps instead of a full
    * per-group sort. Columns are resolved by name against the
    * analyzed child plan — a hand-built logical node sits outside the
    * analyzer's Column-resolution paths. */
  def groupedTopKOrdered(df: DataFrame, keys: Seq[String],
                         sort: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(sort.nonEmpty, "groupedTopKOrdered needs at least one sort column")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    val sortOrder = sort.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark, GroupedTopK(
      keys.map(attr), sortOrder, k, analyzed))
  }

  /** Legacy two-column entry (the q_window_topn shape): rows
    * maximizing `order`, ties broken by minimum `tie` — i.e.
    * `orderBy(desc(order), asc(tie))`, nulls last/first per Spark's
    * direction defaults. Any orderable column types work. */
  def groupedTopK(df: DataFrame, keys: Seq[String], order: String,
                  tie: String, k: Int): DataFrame =
    groupedTopKOrdered(df, keys, Seq(order -> false, tie -> true), k)

  private def ensureRegistered(spark: SparkSession): Unit =
    spark.experimental.extraStrategies =
      if (spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
        spark.experimental.extraStrategies
      else spark.experimental.extraStrategies :+ GroupedTopKStrategy
}
