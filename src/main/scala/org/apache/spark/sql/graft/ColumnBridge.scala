package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) bridge; the classic
  * helpers are private[sql]. This shim lives under the sql package to
  * expose exactly the two conversions our custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a hand-built LogicalPlan as a DataFrame (Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** LAZY localCheckpoint that does NOT carry origin statistics
    * forward. `Dataset.localCheckpoint` preserves the optimized
    * plan's stats on the resulting LogicalRDD — correct for one
    * checkpoint, catastrophic in an iterate-and-checkpoint loop with
    * a self-join: size-in-bytes stats MULTIPLY through a join, so the
    * carried figure SQUARES every round. Its digit count then doubles
    * per round, plan-stats estimation degenerates into
    * million-digit BigInteger multiplications (observed: a
    * connected-components run planning, not executing, for 20
    * minutes), and past ~31 rounds Spark throws `BigInteger would
    * overflow supported range`. Dropping the origin stats resets each
    * round to the default size estimate — the loop's joins were never
    * broadcast candidates anyway.
    *
    * Like the built-in lazy checkpoint, the RDD is marked here and
    * materialized by the caller's next action, truncating RDD lineage
    * without an extra job. */
  def localCheckpointNoStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    // same physical contract as Dataset.checkpoint: materialized rows
    // are buffer-reused UnsafeRows — copy before caching them
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      org.apache.spark.sql.execution.LogicalRDD(
        ds.queryExecution.analyzed.output, rdd)(session))
  }
}
