package graft

import org.apache.spark.sql.functions._

/** Scale posture evidence: date-partitioned storage + a date
  * predicate → only the matching partition directories are read
  * (PartitionFilters in the scan, one input file). This is the
  * cluster-side answer to the reference's string-built date-range SQL
  * (SparkUtils.java:73-77) — the same `where` clause, but pruning
  * whole directories instead of scanning everything.
  */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + date filter prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    Tables.eventsNorm(spark, sf)
      .withColumn("date", date_format(col("event_time"), "yyyy-MM-dd"))
      .write.partitionBy("date").mode("overwrite")
      .parquet(dir.getAbsolutePath)

    val q = spark.read.parquet(dir.getAbsolutePath)
      .where(col("date") === "2024-01-05")
      .groupBy("event_type").count()
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PartitionFilters"), formatted)
    assert(formatted.contains("(date"), formatted) // pruning predicate present
    // and the scan reads exactly the one partition's file(s)
    val scanned = q.queryExecution.sparkPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(1), s"selected partitions: $scanned")
    assert(q.count() > 0)
  }
}
