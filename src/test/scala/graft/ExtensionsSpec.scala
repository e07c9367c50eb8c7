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
                simhash64(array('a', 'b')) AS sh""").collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getString(1).length == 16)
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
