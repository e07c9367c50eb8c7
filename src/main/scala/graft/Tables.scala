package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per
  * table. All queries take the sf directory as a parameter so the
  * same code runs at any scale factor — at cluster scale these
  * would be partitioned directories, and every reader here goes
  * through `spark.read.parquet` so partition discovery / predicate
  * pushdown apply unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")

  /** Normalized events: whatever physical type the fixture
    * generation wrote `ts` as — INT64 TIMESTAMP(NANOS) (older
    * fixtures; Spark's vectorized reader only accepts it as a raw
    * long under the legacy conf) or plain TIMESTAMP/TIMESTAMP_NTZ
    * micros (current fixtures) — derive the same epoch-seconds
    * column + a second-precision timestamp, so every downstream
    * operator is schema-generation-agnostic. DuckDB-oracle
    * equivalent either way: `epoch_ns(ts)//1000000000` (epoch_ns
    * accepts both timestamps and reads back the stored instant).
    */
  def eventsNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // harmless when ts is already micros; required to read nanos files
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val tsSec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
      // NTZ→LTZ cast is a no-op under the pinned UTC session zone;
      // unix_micros then reads the exact instant, integral DIV floors
      // (all fixture instants are positive)
      case _ => expr("unix_micros(cast(ts as timestamp)) div 1000000")
    }
    raw.withColumn("ts_sec", tsSec)
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Total row count read from parquet FOOTERS only — a driver-side
    * metadata read: no Spark job, no data scan. Stops summing once
    * `stopAfter` is exceeded, so on a huge corpus a size *guard*
    * costs O(1) footers rather than O(files) — callers only need to
    * know "at or under the bound, exactly" vs "over it". */
  def parquetRowCount(spark: SparkSession, path: String,
                      stopAfter: Long = Long.MaxValue): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val statuses =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && {
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
      else Array(fs.getFileStatus(p))
    var total = 0L
    val it = statuses.iterator
    while (it.hasNext && total <= stopAfter) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(it.next(), conf))
      try total += reader.getRecordCount
      finally reader.close()
    }
    total
  }

  /** Registers every table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
