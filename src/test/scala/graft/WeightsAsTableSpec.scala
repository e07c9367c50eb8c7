package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}

/** The weights-as-table seams: a trained model export (classifier
  * weight vector, encoder projection matrix) rides in as DATA through
  * the same plans the stubs run — zero plan changes. Feeding
  * hand-built weight tables through both must give hand-computable
  * results, and malformed tables must be rejected at read. */
class WeightsAsTableSpec extends SparkSpec {

  import spark.implicits._

  /** The classifier's bucket rule, recomputed independently:
    * first 6 md5 hex digits → integer → mod dim. */
  private def bucketOf(token: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 6)
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  test("classifier scores documents with an exported weight table") {
    val w = Seq.tabulate(4)(b => (b, Array(-1.0, -0.25, 0.25, 1.0)(b)))
      .toDF("bucket", "weight")
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifierWith(docs, w)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap

    def expected(tokens: Seq[String]): Double = {
      val weights = Array(-1.0, -0.25, 0.25, 1.0)
      val mean = tokens.map(t => weights(bucketOf(t, 4))).sum / tokens.size
      val p = 1.0 / (1.0 + math.exp(-4.0 * mean))
      math.floor(p * 10000 + 0.5) / 10000
    }
    val e1 = expected(Seq("alpha", "beta", "gamma"))
    val e2 = expected(Seq("delta", "epsilon"))
    assert(got(1L)._1 == e1 && got(1L)._2 == (e1 >= 0.5))
    assert(got(2L)._1 == e2 && got(2L)._2 == (e2 >= 0.5))
  }

  test("classifier weight tables with bucket gaps are rejected at read") {
    val bad = Seq((0, 1.0), (2, 1.0)).toDF("bucket", "weight")
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.qualityClassifierWith(docs, bad).collect()
    }
    assert(e.getMessage.contains("buckets"))
  }

  test("identity projection table reproduces the stub embedding exactly") {
    val media = Multimodal.mediaTable(spark, sf)
    val identity = (for (o <- 0 until 16; i <- 0 until 16)
      yield (o, i, if (o == i) 1.0f else 0.0f)).toSeq
      .toDF("out_dim", "in_dim", "weight")
    val viaTable = Multimodal
      .embedWith(media, Multimodal.projectionOf(identity))
      .collect().map(e => e.vec_id -> e.embedding.toSeq).toMap
    val stub = Multimodal.embed(media)
      .collect().map(e => e.vec_id -> e.embedding.toSeq).toMap
    assert(viaTable == stub)
  }

  test("a hand-built 2x16 projection computes W·h over the stub features") {
    // row 0 sums ALL histogram bins (= total byte count), row 1 picks
    // bin 3 only — both hand-checkable against the raw bytes
    val proj = ((0 until 16).map(i => (0, i, 1.0f)) ++
      (0 until 16).map(i => (1, i, if (i == 3) 1.0f else 0.0f)))
      .toDF("out_dim", "in_dim", "weight")
    val media = Multimodal.mediaTable(spark, sf).limit(5).cache()
    val got = Multimodal.embedWith(media, Multimodal.projectionOf(proj))
      .collect().map(e => e.vec_id -> e.embedding.toSeq).toMap
    val raw = media.collect()
    raw.foreach { r =>
      val total = r.content.length.toFloat
      val bin3 = r.content.count(b => (b & 0xff) % 16 == 3).toFloat
      assert(got(r.doc_id) == Seq(total, bin3),
        s"doc ${r.doc_id}: ${got(r.doc_id)} vs ($total, $bin3)")
    }
  }

  test("incomplete projection tables are rejected at read") {
    val bad = Seq((0, 0, 1.0f), (0, 1, 2.0f)).toDF("out_dim", "in_dim", "weight")
    val e = intercept[IllegalArgumentException](Multimodal.projectionOf(bad))
    assert(e.getMessage.contains("projection"))
  }
}
