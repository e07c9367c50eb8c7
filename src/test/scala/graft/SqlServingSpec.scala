package graft

import graft.operators.{Similarity, SqlSurface, TextAnalysis}

/** The serving-family SQL twins (text_bm25_sql / sim_ivf_sql): the
  * oracle gates prove the VALUES; this spec proves (1) the SQL plans
  * keep the standing-index scale shape — the posting/cell scans are
  * bucket-PRUNED by the interpolated literal IN-lists, exactly like
  * their DataFrame twins — and (2) both surfaces return identical
  * rows (two entry languages, one semantics).
  */
class SqlServingSpec extends SparkSpec {

  private def bucketedScans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.bucketSpec.isDefined => f
    }

  private def assertPruned(df: org.apache.spark.sql.DataFrame,
                           what: String): Unit = {
    val scans = bucketedScans(df)
    assert(scans.nonEmpty, s"no bucketed scan in the $what plan")
    val pruned = scans.filter { s =>
      s.optionalBucketSet.exists(_.cardinality() <
        s.relation.bucketSpec.get.numBuckets)
    }
    assert(pruned.nonEmpty,
      s"no bucket-pruned scan in the $what plan: every bucketed scan reads all buckets")
  }

  test("text_bm25_sql rows equal the indexed DataFrame twin's") {
    val sql = SqlSurface.qTextBm25Sql(spark, sf).collect().map(_.toSeq)
    val df = TextAnalysis.qTextBm25Indexed(spark, sf).collect().map(_.toSeq)
    assert(sql.toSeq == df.toSeq)
  }

  test("text_bm25_sql prunes the posting scan to the batch's term buckets") {
    assertPruned(SqlSurface.qTextBm25Sql(spark, sf), "text_bm25_sql")
  }

  test("sim_ivf_sql rows equal the indexed DataFrame twin's") {
    val sql = SqlSurface.qSimIvfSql(spark, sf).collect().map(_.toSeq)
    val df = Similarity.qSimIvfIndexed(spark, sf).collect().map(_.toSeq)
    assert(sql.toSeq == df.toSeq)
  }

  test("sim_ivf_sql prunes the index scan to the probed cells") {
    assertPruned(SqlSurface.qSimIvfSql(spark, sf), "sim_ivf_sql")
  }
}
