package graft

import org.apache.spark.sql.SparkSession
import graft.plans.{GraftExtensions, SelfCosine}

/** The extensions get their own session (extensions bind at build
  * time); getOrCreate would reuse the shared one, so build with a
  * distinct app name + newSession semantics. */
class ExtensionsSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // getOrCreate on a live session ignores withExtensions (another
    // suite may have built the session first) — use the install path,
    // which is also what production code on a shared session calls
    GraftExtensions.install(spark)
    spark
  }

  test("SQL-registered custom functions are callable") {
    val row = extSpark.sql(
      """SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                simhash64(array('a', 'b')) AS sh,
                squared_distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d""")
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getString(1).length == 16)
    assert(row.getDouble(2) == 25.0)
  }

  test("LLM scalar recipes are callable from SQL and typed like their Column twins") {
    val df = extSpark.sql(
      """SELECT bpe_token_count("it's 42 tokens, maybe") AS n,
                shingles3('a b c d') AS sh""")
    val schema = df.schema
    assert(schema("n").dataType == org.apache.spark.sql.types.LongType,
      s"bpe_token_count must return BIGINT from SQL, got ${schema("n").dataType}")
    val row = df.collect().head
    assert(row.getLong(0) > 0)
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
  }

  test("self-cosine rewrite is element-type-aware (double arrays too)") {
    import extSpark.implicits._
    // parquet round-trip: a literal Seq is folded into a LocalRelation
    // before user rules run, so the rewrite wouldn't fire (and the
    // raw FP cosine of (v,v) is 0.99999…, not exactly 1). The vector
    // (0.0, 1.0) is the regression case: a getFloat scan over the
    // double-backed array reads the zero words first and would return
    // 0.0 for a NONZERO vector.
    val dir = java.nio.file.Files.createTempDirectory("selfcos").toString
    Seq((1L, Array(0.0, 1.0)), (2L, Array(0.0, 0.0)))
      .toDF("id", "v").write.mode("overwrite").parquet(dir)
    val df = extSpark.read.parquet(dir)
      .selectExpr("id", "cosine_similarity(v, v) AS c")
    val fired = df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[SelfCosine]))
    assert(fired, "rewrite did not fire on the double-array column")
    val got = df.orderBy("id").select("c").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0), s"double-array self-cosine broke: $got")
  }

  test("self-cosine rewrite fires and preserves semantics") {
    import extSpark.implicits._
    // parquet source: a literal Seq would be constant-folded into a
    // LocalRelation before the plan can be inspected
    val df = extSpark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cosine_similarity(embedding, embedding) AS c")
    val optimized = df.queryExecution.optimizedPlan
    val fired = optimized.expressions.exists(_.exists(_.isInstanceOf[SelfCosine]))
    assert(fired, s"rule did not fire:\n$optimized")
    val got = df.where($"vec_id" < 5).select("c").as[Double].collect().toSeq
    assert(got.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("distinct arguments are NOT rewritten") {
    import extSpark.implicits._
    val df = Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .selectExpr("cosine_similarity(a, b) AS c")
    assert(!df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[SelfCosine])))
    assert(df.as[Double].collect().head == 0.0)
  }
}
