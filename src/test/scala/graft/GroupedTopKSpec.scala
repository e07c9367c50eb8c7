package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{GroupedTopKApi, GroupedTopKExec}

class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom grouped top-k equals the window formulation") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val custom = GroupedTopKApi.groupedTopK(orders,
        keys = Seq("o_orderpriority"),
        order = "o_totalprice", tie = "o_orderkey", k = 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == viaWindow)
  }

  test("plan is partial heap -> exchange -> final heap, no sort") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val df = GroupedTopKApi.groupedTopK(orders,
      Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
    df.collect() // force planning through AQE
    // the exec node renders without the Exec suffix; count in the
    // final AQE plan only (the initial plan repeats both nodes)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("GroupedTopK \\[".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
  }

  test("partial heaps merge correctly across many input partitions") {
    val orders = spark.read.parquet(s"$sf/orders.parquet").repartition(7)
    val custom = GroupedTopKApi.groupedTopK(orders,
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    val viaWindow = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select("o_orderpriority", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == viaWindow)
  }

  test("k larger than group size returns whole groups; ties break by min tie") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 10.0, 2L), ("a", 5.0, 3L),
      ("b", 1.0, 9L)).toDF("k", "v", "id")
    val got = GroupedTopKApi.groupedTopK(df, Seq("k"), "v", "id", 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // group a: two v=10 rows win (tie prefers smaller id first, both fit)
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }
}
