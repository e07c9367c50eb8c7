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

  /** Whether the events fixture under `dir` stores `ts` as INT64
    * TIMESTAMP(NANOS) — read once from the parquet FOOTER (driver-side
    * metadata, no Spark job) and cached per path, so deciding the
    * legacy-conf question below never costs a repeated file open. */
  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean = {
    val path = s"$dir/events.parquet"
    tsNanosCache.computeIfAbsent(path, { _ =>
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val st =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).find(s => s.isFile && {
            val n = s.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }).getOrElse(throw new IllegalStateException(s"no data files in $path"))
        else fs.getFileStatus(p)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try {
        import org.apache.parquet.schema.LogicalTypeAnnotation
        import scala.jdk.CollectionConverters._
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.getFields.asScala.find(_.getName == "ts").exists { f =>
          f.isPrimitive && (f.asPrimitiveType().getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
        }
      } finally reader.close()
    })
  }

  /** Normalized events: whatever physical type the fixture
    * generation wrote `ts` as — INT64 TIMESTAMP(NANOS) (older
    * fixtures; Spark's vectorized reader only accepts it as a raw
    * long under the legacy conf) or plain TIMESTAMP/TIMESTAMP_NTZ
    * micros (current fixtures) — derive the same epoch-seconds
    * column + a second-precision timestamp, so every downstream
    * operator is schema-generation-agnostic. DuckDB-oracle
    * equivalent either way: `epoch_ns(ts)//1000000000` (epoch_ns
    * accepts both timestamps and reads back the stored instant).
    *
    * The legacy conf is set ONLY when the footer actually declares
    * TIMESTAMP(NANOS) — a micros fixture never touches session conf.
    * When set it is session-wide and stays set (the scan re-reads it
    * at execution time, so a set/restore around `load` would break
    * the read): any later reader of OTHER nanos-timestamp parquet in
    * that session will see raw longs too. Acceptable here because the
    * fixture set has exactly one nanos-suspect column.
    */
  def eventsNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val nanos = eventsTsIsNanos(s, d)
    if (nanos) s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val tsUs = raw.schema("ts").dataType match {
      // LongType can only mean the footer-confirmed NANOS encoding
      // (a plain INT64-micros column with no logical type would also
      // surface as LongType, but then `nanos` is false and we fail
      // loudly instead of silently dividing by the wrong unit)
      case org.apache.spark.sql.types.LongType =>
        require(nanos, s"events.ts in $d is INT64 without a TIMESTAMP(NANOS) " +
          "logical type; cannot infer its unit — regenerate the fixture with " +
          "an annotated timestamp")
        expr("ts div 1000")
      // NTZ→LTZ cast is a no-op under the pinned UTC session zone;
      // unix_micros then reads the exact instant; div truncates toward
      // zero (equivalent to DuckDB's flooring // for the positive
      // fixture instants)
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }
    // ts_ord is the FULL-precision ordering key — the raw nanos long
    // on a NANOS fixture, micros otherwise — so (ts_ord, event_id)
    // ordering ≡ (ts, event_id) on EVERY fixture generation (ts_us
    // alone would truncate sub-microsecond bits of a nanos fixture
    // and could silently reorder same-microsecond events); ts_us is
    // the micros instant, ts_sec the second-truncated twin every
    // aggregate keys on
    val tsOrd = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts") // nanos
      case _ => tsUs
    }
    raw.withColumn("ts_ord", tsOrd)
      .withColumn("ts_us", tsUs)
      .withColumn("ts_sec", expr("ts_us div 1000000"))
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
