package graft

import org.apache.spark.sql.types._
import graft.sources.Readers

/** JSON ingest with corrupt-record quarantine: malformed lines must
  * be captured verbatim (not dropped, not fatal) while well-formed
  * lines parse into the declared schema — and the two outputs must
  * exactly partition the input.
  */
class JsonQuarantineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("good rows parse, bad lines quarantine verbatim, nothing is lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2 "text": "missing comma"}""", // malformed
      """{"doc_id": 3, "text": "gamma"}""",
      """not json at all""",                       // malformed
      """{"doc_id": 5, "text": "epsilon"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "feed.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val (good, bad) = Readers.jsonWithQuarantine(spark, dir, schema)
    val goodRows = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(goodRows == Set((1L, "alpha"), (3L, "gamma"), (5L, "epsilon")))
    assert(good.columns.toSeq == Seq("doc_id", "text")) // corrupt col dropped

    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines == Set(
      """{"doc_id": 2 "text": "missing comma"}""",
      """not json at all"""))
    // exact partition of the input
    assert(goodRows.size + badLines.size == lines.size)
  }
}
