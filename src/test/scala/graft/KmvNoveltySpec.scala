package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.Text

/** KMV sketch overlap (text_overlap_kmv) and n-gram novelty
  * (text_ngram_novelty): the oracle gates pin the algebra; this spec
  * pins the contracts the gates can't — the KMV estimator's accuracy
  * against the exact Jaccard it replaces, its exact behavior on the
  * two boundary corpora (identical / disjoint sources), the sketch
  * MERGE property that makes source appends incremental, and
  * novelty's planted extremes.
  */
class KmvNoveltySpec extends SparkSpec {

  import spark.implicits._

  private val K = 32

  private def mkDocs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  private def salad(seed: Int, n: Int): String = {
    val words = Seq("join", "hash", "row", "batch", "scan", "spark",
      "table", "query", "stream", "window", "agg", "fast", "vector")
    (0 until n).map(i => words((i * 7 + seed * 13 + i * i) % words.size))
      .mkString(" ")
  }

  test("identical sources estimate 1.0, disjoint sources estimate 0.0") {
    val a = salad(1, 120)
    val b = (0 until 120).map(i => s"tok${i}x tok${i}y").mkString(" ")
    val docs = mkDocs(Seq(
      (1L, a, "same1"), (2L, a, "same2"), (3L, b, "other")))
    val out = TextAnalysis.overlapKmv(docs, K)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out(("same1", "same2")) == 1.0)
    assert(out(("other", "same1")) == 0.0)
    assert(out(("other", "same2")) == 0.0)
  }

  test("KMV estimate tracks exact 3-gram Jaccard on the fixture sources") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val est = TextAnalysis.overlapKmv(docs, K)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // exact 3-gram source Jaccard, computed the expensive way the
    // sketch exists to avoid
    val vocab = docs
      .select(col("source"), explode(Text.shingles3(col("text"))).as("sh"))
      .distinct()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val shared = vocab.as("a").join(vocab.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val errs = est.map { case ((sa, sb), e) =>
      val inter = shared.getOrElse((sa, sb), 0L).toDouble
      val exact = inter / (sizes(sa) + sizes(sb) - inter)
      math.abs(e - exact)
    }
    assert(errs.nonEmpty)
    val mae = errs.sum / errs.size
    // k=32 → standard error ~1/√k ≈ 0.18 worst-case; the fixture's
    // moderate overlaps should average far below that
    assert(mae <= 0.12, s"KMV mean abs error $mae")
    assert(errs.max <= 0.30, s"KMV worst abs error ${errs.max}")
  }

  test("sketch of a union == k-min merge of the halves' sketches (append path)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val full = TextAnalysis.kmvSketch(docs, K)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val merged = TextAnalysis.kmvSketch(half1, K)
      .unionByName(TextAnalysis.kmvSketch(half2, K))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("h")))
      .filter(col("rn") <= K).drop("rn")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(merged == full)
  }

  test("KMV cardinality estimate tracks exact distinct-shingle counts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val est = TextAnalysis.kmvCardinality(
        TextAnalysis.kmvSketch(docs, K), K)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = docs
      .select(col("source"), explode(Text.shingles3(col("text"))).as("sh"))
      .distinct().groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val relErrs = exact.map { case (src, n) =>
      val (nSketch, e) = est(src)
      if (nSketch < K) { assert(e == n.toDouble); 0.0 } // exact regime
      else math.abs(e - n) / n
    }
    val mre = relErrs.sum / relErrs.size
    // k=32 → relative standard error ~1/√(k−2) ≈ 0.18
    assert(mre <= 0.20, s"KMV cardinality mean rel err $mre")
    assert(relErrs.max <= 0.60, s"worst rel err ${relErrs.max}")
  }

  test("novelty: duplicated doc scores 0, unique-vocabulary doc scores 1") {
    val shared = salad(5, 40)
    val unique = (0 until 40).map(i => s"only${i}q").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared), (3L, unique), (4L, "too short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._2 == 0.0 && out(2L)._2 == 0.0) // every shingle df=2
    assert(out(3L)._2 == 1.0)                      // every shingle df=1
    assert(out(4L) == ((0L, 0.0)))                 // <3 tokens: kept, zeroed
  }
}
