package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.execution.SparkStrategy

/** Grouped top-k as a custom whole-operator plan (SURVEY §4 noted no
  * custom operator is *required*; this one exists because the
  * built-in formulation — `row_number().over(partitionBy(key).
  * orderBy(x desc)) <= k` — must fully SORT every key group, while a
  * bounded per-key heap is O(n log k) and keeps at most k rows per
  * key in memory. The physical plan mirrors partial/final
  * aggregation: a partial heap pass per input partition, one shuffle
  * clustered on the keys, then a final heap pass — so the shuffle
  * carries at most k·partitions rows per key, not the group.
  *
  * Ordering semantics: rows maximizing `order` (double), ties broken
  * by minimizing `tie` (long) — exactly the q_window_topn shape.
  */
case class GroupedTopK(keys: Seq[Expression], order: Expression,
                       tie: Expression, k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK =
    copy(child = c)
}

/** One heap pass: keep the k best rows per key seen in this
  * partition. `finalPass` adds the clustered-distribution requirement
  * that makes the result exact. */
case class GroupedTopKExec(keys: Seq[Expression], order: Expression,
                           tie: Expression, k: Int, finalPass: Boolean,
                           child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPass) Seq(ClusteredDistribution(keys))
    else Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExpr = order
    val tieExpr = tie
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      val boundTie = BindReferences.bindReference(tieExpr, childOutput)
      // min-heap ordered by (order asc, tie desc): the root is the
      // currently-worst row, evicted when a better one arrives.
      // Null semantics mirror the window formulation
      // `orderBy(desc(order), asc(tie))`: a null order ranks below
      // every value (desc = nulls last), a null tie ranks above every
      // value (asc = nulls first).
      case class Entry(ordNull: Boolean, ord: Double,
                       tieNull: Boolean, tie: Long, row: UnsafeRow)
      val cmp = new java.util.Comparator[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          if (a.ordNull != b.ordNull) return if (a.ordNull) -1 else 1
          val c = java.lang.Double.compare(a.ord, b.ord)
          if (c != 0) return c
          if (a.tieNull != b.tieNull) return if (a.tieNull) 1 else -1
          java.lang.Long.compare(b.tie, a.tie)
        }
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[Entry](limit + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        val oVal = boundOrder.eval(row)
        val tVal = boundTie.eval(row)
        val e = Entry(oVal == null,
          if (oVal == null) 0.0 else oVal.asInstanceOf[Double],
          tVal == null,
          if (tVal == null) 0L else tVal.asInstanceOf[Long],
          row.asInstanceOf[UnsafeRow].copy())
        if (heap.size < limit) heap.add(e)
        else if (cmp.compare(e, heap.peek()) > 0) { heap.poll(); heap.add(e) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala.map(_.row))
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
    case GroupedTopK(keys, order, tie, k, child) =>
      GroupedTopKExec(keys, order, tie, k, finalPass = true,
        GroupedTopKExec(keys, order, tie, k, finalPass = false,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupedTopKApi {
  /** DataFrame entry: top `k` rows per `keys` maximizing `order`
    * (a double column), ties broken by minimum `tie` (a long column).
    * Columns are resolved by name against the analyzed child plan —
    * a hand-built logical node sits outside the analyzer's
    * Column-resolution paths. */
  def groupedTopK(df: DataFrame, keys: Seq[String], order: String,
                  tie: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    spark.experimental.extraStrategies =
      if (spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
        spark.experimental.extraStrategies
      else spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    // fail at plan time with a readable message, not at executor
    // runtime with a ClassCastException from Entry's primitive fields
    val orderAttr = attr(order)
    if (orderAttr.dataType != org.apache.spark.sql.types.DoubleType)
      throw new IllegalArgumentException(
        s"groupedTopK order column '$order' must be DOUBLE, " +
        s"got ${orderAttr.dataType.simpleString}")
    val tieAttr = attr(tie)
    if (tieAttr.dataType != org.apache.spark.sql.types.LongType)
      throw new IllegalArgumentException(
        s"groupedTopK tie column '$tie' must be BIGINT, " +
        s"got ${tieAttr.dataType.simpleString}")
    ColumnBridge.ofRows(spark, GroupedTopK(
      keys.map(attr), orderAttr, tieAttr, k, analyzed))
  }
}
