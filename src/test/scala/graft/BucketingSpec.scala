package graft

/** Scale posture evidence: bucketing both sides of a recurring join
  * key pre-shuffles the data once at write time; subsequent joins are
  * co-located — the physical plan has no hash-partitioning Exchange
  * on the fact sides. This is the 100 TB answer for repeated
  * fact-fact joins (session detail ⋈ filtered sessions, etc.).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without a shuffle on either side") {
    // in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear both
    Seq("orders_bucketed", "customer_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    cust.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          spark.table("orders_bucketed")("o_custkey") ===
          spark.table("customer_bucketed")("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it actually runs
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
