package graft

import graft.operators.Dedup

/** Hand-computed cases for the ExactSubstr-style verbatim-coverage
  * operator (8-token windows shared across distinct docs, per-doc
  * interval merge). */
class VerbatimCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    Dedup.verbatimCoverage(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("a single shared 8-token run is reported in both docs, nothing else") {
    val shared = "a b c d e f g h"                    // exactly one window
    val out = run(Seq(
      (1L, s"$shared x1 y1 z1 w1"),                   // 12 tokens, run at p=1
      (2L, s"p2 q2 $shared r2"),                      // 11 tokens, run at p=3
      (3L, "u v w just unrelated words here entirely different")))
    assert(out(1L) == ((8L, 0.6667)), out.toString)   // 8/12
    assert(out(2L) == ((8L, 0.7273)), out.toString)   // 8/11
    assert(!out.contains(3L), "unique doc must produce no row")
  }

  test("overlapping shared windows merge into one island (no double count)") {
    // 10 shared tokens → 3 overlapping windows; merged coverage is 10
    val ten = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val out = run(Seq(
      (1L, s"$ten x y"),                              // 12 tokens
      (2L, s"m n $ten")))                             // 12 tokens
    assert(out(1L) == ((10L, 0.8333)), out.toString)  // 10/12, not 24/12
    assert(out(2L) == ((10L, 0.8333)), out.toString)
  }

  test("repeats within one doc alone do not count as duplication") {
    val run8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    val out = run(Seq(
      (1L, s"$run8 mid $run8"),                       // self-repeat only
      (2L, "o1 o2 o3 o4 o5 o6 o7 o8 o9 other tokens")))
    assert(out.isEmpty, s"self-repeats flagged: $out")
  }

  test("identical docs are fully covered") {
    val text = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"
    val out = run(Seq((1L, text), (2L, text)))
    assert(out(1L) == ((11L, 1.0)))
    assert(out(2L) == ((11L, 1.0)))
  }

  private def rewrite(docs: Seq[(Long, String)]): Map[Long, (Long, String)] =
    Dedup.verbatimRewrite(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("rewrite: the lowest doc_id keeps the shared span, every other holder loses exactly it") {
    val shared = "a b c d e f g h"
    val out = rewrite(Seq(
      (1L, s"$shared x1 y1 z1 w1"),
      (2L, s"p2 q2 $shared r2"),
      (3L, "u v w just unrelated words here entirely different")))
    // owner untouched; non-owner keeps everything around the span
    assert(out(1L) == ((0L, s"$shared x1 y1 z1 w1")))
    assert(out(2L) == ((8L, "p2 q2 r2")))
    // clean docs come back unchanged — a rewrite must never drop rows
    assert(out(3L) == ((0L, "u v w just unrelated words here entirely different")))
  }

  test("rewrite: an identical pair keeps one full copy and empties the other") {
    val text = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11"
    val out = rewrite(Seq((1L, text), (2L, text)))
    assert(out(1L) == ((0L, text)))
    assert(out(2L) == ((11L, "")))
  }

  test("rewrite: self-repeats survive — only cross-doc duplication is cut") {
    val run8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    val out = rewrite(Seq(
      (1L, s"$run8 mid $run8"),
      (2L, "o1 o2 o3 o4 o5 o6 o7 o8 o9 other tokens")))
    assert(out(1L) == ((0L, s"$run8 mid $run8")))
    assert(out(2L)._1 == 0L)
  }

  test("rewrite never removes more than coverage measures, and content is conserved on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
    val cov = run(docs)
    val rew = rewrite(docs)
    assert(rew.keySet == docs.map(_._1).toSet, "rewrite dropped docs")
    rew.foreach { case (id, (removed, _)) =>
      // a doc can only lose spans coverage flagged (owners lose less)
      assert(removed <= cov.getOrElse(id, (0L, 0.0))._1,
        s"doc $id removed $removed > covered ${cov.get(id)}")
    }
    // conservation: total kept tokens shrink by exactly the removals
    val totalBefore = docs.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
    val totalAfter = rew.values.map { case (_, t) =>
      t.split("\\s+").count(_.nonEmpty).toLong }.sum
    assert(totalBefore - totalAfter == rew.values.map(_._1).sum)
  }
}
