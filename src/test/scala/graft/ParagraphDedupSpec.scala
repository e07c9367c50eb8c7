package graft

import graft.operators.Dedup

/** Behavioral contracts of paragraph-level dedup (dedup_paragraphs)
  * beyond the oracle gate's fixture algebra: whole-duplicate
  * documents vanish, shared segments survive exactly once at their
  * first (doc_id, seg_idx) occurrence, reassembly preserves segment
  * order, and within-doc repeats collapse. Segments are disjoint
  * 16-token windows, so docs here are built from exact 16-token
  * "paragraphs" to make the segmentation visible.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  // a 16-token segment with a distinguishable name
  private def seg(name: String): String =
    (1 to 16).map(i => s"$name$i").mkString(" ")

  private def run(docs: Seq[(Long, String)]) =
    Dedup.dedupParagraphs(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("an exact duplicate document disappears entirely") {
    val text = seg("a") + " " + seg("b")
    val out = run(Seq((1L, text), (2L, text)))
    assert(out.map(_._1).toSeq == Seq(1L))
    assert(out.head._4 == text)
  }

  test("a shared segment survives once, at its first occurrence; novel segments stay") {
    val out = run(Seq(
      (1L, seg("a") + " " + seg("b")),
      (2L, seg("a") + " " + seg("c")))) // seg a already owned by doc 1
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == seg("a") + " " + seg("b"))
    assert(byId(2L)._4 == seg("c"), "doc 2 must keep only its novel segment")
    assert(byId(2L)._2 == 2L && byId(2L)._3 == 1L) // n_segs=2, n_kept=1
  }

  test("reassembly preserves segment order around a removed middle segment") {
    val out = run(Seq(
      (1L, seg("x")),
      (2L, seg("p") + " " + seg("x") + " " + seg("q"))))
    val doc2 = out.find(_._1 == 2L).get
    assert(doc2._4 == seg("p") + " " + seg("q"))
  }

  test("a segment repeated within one document collapses to its first position") {
    val out = run(Seq((1L, seg("a") + " " + seg("a") + " " + seg("b"))))
    assert(out.head._4 == seg("a") + " " + seg("b"))
    assert(out.head._2 == 3L && out.head._3 == 2L)
  }

  test("fixture corpus: kept segments equal corpus-wide distinct segments (nothing lost, nothing doubled)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.dedupParagraphs(docs)
    import org.apache.spark.sql.functions._
    val kept = out.agg(sum("n_kept")).head.getLong(0)
    // independently: distinct 16-token segment texts in the corpus
    val toks = graft.functions.Text.tokens(col("text"))
    val distinctSegs = docs
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("n_segs", greatest(lit(1L),
        ceil(size(col("toks")) / 16.0).cast("long")))
      .select(col("toks"),
        explode(sequence(lit(0L), col("n_segs") - 1)).as("i"))
      .select(concat_ws(" ",
        slice(col("toks"), (col("i") * 16).cast("int") + 1, lit(16))).as("seg"))
      .distinct().count()
    assert(kept == distinctSegs, s"kept=$kept distinct=$distinctSegs")
  }
}
