package graft

import org.apache.spark.sql.functions._
import graft.core.TaskParams
import graft.sources.Readers
import org.apache.spark.sql.types._

class TaskParamsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("2019-01-01", 25.0, "pro1", "male", "hotpot rocks"),
    ("2019-01-02", 61.0, "pro2", "female", "cake"),
    ("2019-02-01", 30.0, "pro1", "male", "nothing")).toDF(
    "date", "age", "professional", "sex", "keywords")

  private def keep(p: TaskParams): Seq[String] =
    df.where(TaskParams.predicate(p, col("date"), col("age"),
        col("professional"), col("sex"), col("keywords")))
      .select("date").as[String].collect().toSeq.sorted

  test("absent params pass everything") {
    assert(keep(TaskParams()) == Seq("2019-01-01", "2019-01-02", "2019-02-01"))
  }

  test("each predicate kind filters like ValidUtils") {
    assert(keep(TaskParams(startDate = Some("2019-01-02"))) ==
      Seq("2019-01-02", "2019-02-01"))
    assert(keep(TaskParams(minValue = Some(26), maxValue = Some(65))) ==
      Seq("2019-01-02", "2019-02-01"))
    assert(keep(TaskParams(categories = Some(Seq("pro2")))) == Seq("2019-01-02"))
    assert(keep(TaskParams(kind = Some("male"))) ==
      Seq("2019-01-01", "2019-02-01"))
    assert(keep(TaskParams(keywords = Some(Seq("hotpot", "cake")))) ==
      Seq("2019-01-01", "2019-01-02"))
  }

  test("conjunction of several params") {
    assert(keep(TaskParams(startDate = Some("2019-01-01"),
      endDate = Some("2019-01-31"), kind = Some("male"))) == Seq("2019-01-01"))
  }

  test("fromJson parses the single-element-array convention") {
    val p = TaskParams.fromJson(
      """{"startDate":["2019-01-01"],"minValue":["20"],
         "categories":["a,b"],"keywords":["x,y"]}""")
    assert(p.startDate.contains("2019-01-01"))
    assert(p.minValue.contains(20.0))
    assert(p.categories.contains(Seq("a", "b")))
    assert(p.keywords.contains(Seq("x", "y")))
    assert(p.endDate.isEmpty && p.kind.isEmpty)
  }

  test("delimited-text reader round-trips a reference-style file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "rows.txt")
    val bw = new java.io.PrintWriter(f)
    bw.println("2019-01-011abc")
    bw.println("2019-01-022def")
    bw.close()
    val schema = StructType(Seq(
      StructField("date", StringType), StructField("id", LongType),
      StructField("s", StringType)))
    val got = Readers.delimitedText(spark, f.getAbsolutePath, schema, "")
      .orderBy("id").collect()
    assert(got.length == 2 && got(1).getString(2) == "def")
  }
}
