package graft

import org.apache.spark.sql.functions._
import graft.operators.{EvalScoring, TextAnalysis}

/** Preference-pair construction (eval_preference_pairs) and
  * skip-gram PMI (text_skipgram_pmi): the oracle gates pin the rows;
  * this spec pins the semantics the gates can't — chosen really is
  * the reward arg-max with deterministic tie handling, zero-margin
  * prompts are dropped, and PMI ranks a planted collocation above
  * independent fillers.
  */
class PreferencePmiSpec extends SparkSpec {

  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, Long, String, String)]) =
    EvalScoring.preferencePairs(
        rows.toDF("prompt_id", "cand_id", "pred", "ref"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))

  test("chosen = reward arg-max, rejected = arg-min, margin positive") {
    val out = pairsOf(Seq(
      (1L, 10L, "alpha beta gamma", "alpha beta gamma delta"), // high F1
      (1L, 11L, "alpha zzz", "alpha beta gamma delta"),        // mid
      (1L, 12L, "qqq rrr sss", "alpha beta gamma delta")))     // zero
    assert(out.length == 1)
    val (p, chosen, rejected, margin) = out.head
    assert(p == 1L && chosen == 10L && rejected == 12L && margin > 0)
  }

  test("an all-tied panel yields no pair; ties break to smaller/larger ids") {
    val tied = pairsOf(Seq(
      (1L, 10L, "same text", "same text"),
      (1L, 11L, "same text", "same text")))
    assert(tied.isEmpty)
    val out = pairsOf(Seq(
      (2L, 20L, "alpha beta", "alpha beta"), // f1 = 1 (tie best)
      (2L, 21L, "alpha beta", "alpha beta"), // f1 = 1 (tie best)
      (2L, 22L, "zzz", "alpha beta")))       // worst
    assert(out.toSeq == Seq((2L, 20L, 22L, 1.0)))
  }

  test("PMI separates an always-adjacent pair from a rarely-adjacent one") {
    // north/pole and alpha/beta have IDENTICAL unigram counts (once
    // per doc each); north-pole are always adjacent, alpha-beta only
    // in every 5th doc (else pushed beyond the ±2 window) — so
    // PMI(north,pole) − PMI(alpha,beta) = ln(200/40) > 0 exactly,
    // independent of the pair-total and unigram normalizers.
    val docs = (0 until 200).map { i =>
      val t = if (i % 5 == 0) s"north pole alpha beta f${i % 4}"
              else s"north pole alpha g${i % 4} h${i % 3} beta"
      (i.toLong, t)
    }
    val byPair = TextAnalysis.skipgramPmi(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(byPair.contains(("north", "pole")))
    assert(byPair.contains(("alpha", "beta")))
    val delta = byPair(("north", "pole")) - byPair(("alpha", "beta"))
    assert(math.abs(delta - math.log(5.0)) < 0.001,
      s"expected ln(5) separation, got $delta")
  }

  test("fixture output is ordered by pmi desc and min-count filtered") {
    val out = TextAnalysis.qSkipgramPmi(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    val pmis = out.map(_.getDouble(3))
    assert(pmis.sameElements(pmis.sorted(Ordering[Double].reverse)))
    assert(out.forall(_.getLong(2) >= 5))
  }
}
