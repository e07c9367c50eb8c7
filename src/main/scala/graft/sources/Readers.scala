package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers beyond the parquet fixtures — the reference's other
  * ingest paths, Spark-first.
  */
object Readers {

  /** Delimited text table (reference: Hive `-delimited text
    * loads, README.md:1584-1630; `user_visit_action.txt`). */
  def delimitedText(spark: SparkSession, path: String, schema: StructType,
                    sep: String = ""): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", sep)
      .option("header", "false")
      .csv(path)

  /** JDBC dimension read (reference: city_info via
    * sqlContext.read().format("jdbc"), AreaTop3ProductSpark.java:
    * 180-228). Partitioned-read options included: at scale a
    * single-threaded JDBC scan is the bottleneck, so callers pass a
    * numeric split column. No database ships in this container —
    * construction is exercised, execution isn't. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                user: String, password: String,
                partitionColumn: Option[String] = None,
                lowerBound: Long = 0L, upperBound: Long = 1L,
                numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(base) { c =>
      base.option("partitionColumn", c)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }.load()
  }

  /** Catalog table write+read (reference: saveAsTable("top3_sales"),
    * RowNumberWindowFunction.java:54-56). */
  def saveTable(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").saveAsTable(name)

  /** Overwrite-safe plain table write: the in-memory catalog forgets
    * tables between JVMs but their warehouse directories persist, so
    * a bare overwrite can trip over a stale dir the catalog doesn't
    * own. Drop both, then write. */
  def replaceTable(df: DataFrame, name: String): Unit = {
    dropTableAndDir(df.sparkSession, name)
    df.write.mode("overwrite").saveAsTable(name)
  }

  /** Bucketed-and-sorted catalog write — the co-location contract
    * behind both the no-shuffle fact joins (BucketingSpec) and the
    * IVF index's prunable cells: rows sharing `bucketCol` land in the
    * same file bucket, and an equality/IN filter on that column lets
    * the scan skip whole buckets (SelectedBucketsCount). */
  def saveBucketedTable(df: DataFrame, name: String, buckets: Int,
                        bucketCol: String): Unit = {
    dropTableAndDir(df.sparkSession, name)
    df.write.bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .mode("overwrite").saveAsTable(name)
  }

  private def dropTableAndDir(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
