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

  test("unknown columns are rejected at plan time") {
    val df = Seq(("a", 1.0, 2L)).toDF("k", "v", "id")
    val e = intercept[IllegalArgumentException] {
      GroupedTopKApi.groupedTopK(df, Seq("k"), "nope", "id", 2)
    }
    assert(e.getMessage.contains("column nope not in"), e.getMessage)
  }

  test("generalized ordering: int order / string tie match the window") {
    val df = Seq(
      ("a", 3, "x"), ("a", 3, "w"), ("a", 9, "z"), ("a", 1, "q"),
      ("b", 5, "m"), ("b", 5, "n"), ("b", 4, "a")).toDF("k", "v", "id")
    val custom = GroupedTopKApi.groupedTopK(df, Seq("k"), "v", "id", 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val w = Window.partitionBy("k").orderBy(desc("v"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).where($"rn" <= 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(custom == viaWindow)
  }

  test("groupedTopKOrdered: ascending string min-k (the stratified-sample shape)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("rk", md5(concat_ws("_", $"doc_id")))
      .withColumn("bucket", pmod($"doc_id", lit(3)))
    val custom = GroupedTopKApi.groupedTopKOrdered(docs,
        keys = Seq("bucket"), sort = Seq("rk" -> true, "doc_id" -> true), k = 5)
      .select("bucket", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("bucket").orderBy($"rk", $"doc_id")
    val viaWindow = docs.withColumn("rn", row_number().over(w)).where($"rn" <= 5)
      .select("bucket", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == viaWindow)
  }

  test("null order ranks last, null tie ranks first — like desc/asc windows") {
    val df = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(10.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(5.0), Some(3L)), ("a", Some(10.0), None))
      .toDF("k", "v", "id")
    val got = GroupedTopKApi.groupedTopK(df, Seq("k"), "v", "id", 2)
      .select("id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    // v=10 rows win over v=5 and v=null; between the two v=10 rows
    // both fit in k=2 (null id = nulls-first would even outrank id=1)
    assert(got == Set(1L, -1L), got)
    val got1 = GroupedTopKApi.groupedTopK(df, Seq("k"), "v", "id", 1)
      .select("id").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    // k=1: null tie ranks FIRST among equal order values
    assert(got1 == Set(-1L), got1)
  }

  test("randomized parity with the window formulation (nulls, mixed directions)") {
    // seeded randomized sweep over data shape, k, partitioning, and
    // sort spec — the generalized ordering path must agree with
    // row_number().over(orderBy(...)) everywhere. Rows are made
    // unique by the trailing id column so ties resolve identically.
    val rnd = new scala.util.Random(42)
    for (case_ <- 1 to 8) {
      val n = 20 + rnd.nextInt(180)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(4).toString,
         if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(12).toDouble),
         if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toString),
         i.toLong)
      }
      val df = rows.toDF("k", "v", "s", "id").repartition(1 + rnd.nextInt(6))
      val k = 1 + rnd.nextInt(5)
      val vAsc = rnd.nextBoolean(); val sAsc = rnd.nextBoolean()
      val sort = Seq("v" -> vAsc, "s" -> sAsc, "id" -> true)
      val custom = GroupedTopKApi.groupedTopKOrdered(df, Seq("k"), sort, k)
        .select("id").collect().map(_.getLong(0)).toSet
      def c(name: String, asc: Boolean) = if (asc) col(name).asc else col(name).desc
      val w = Window.partitionBy("k")
        .orderBy(c("v", vAsc), c("s", sAsc), c("id", asc = true))
      val viaWindow = df.withColumn("rn", row_number().over(w)).where($"rn" <= k)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(custom == viaWindow,
        s"case $case_: n=$n k=$k vAsc=$vAsc sAsc=$sAsc diff=${custom.diff(viaWindow)}/${viaWindow.diff(custom)}")
    }
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
