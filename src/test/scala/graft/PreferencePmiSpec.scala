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

  test("token F1 multiset overlap is exact on 4k-token generations with skewed dupes") {
    // the long-generation regime the sort+run-count fold exists for:
    // pred has 'tok$i' repeated (i%7)+1 times, ref the same token
    // (i%5)+1 times — overlap = Σ min(i%7+1, i%5+1), computed here
    // independently of the column fold. ~2.3k/1.7k tokens per side.
    val n = 600
    val pred = (0 until n).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i")).mkString(" ")
    val ref = (0 until n).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i")).reverse.mkString(" ")
    val expOv = (0 until n).map(i => math.min(i % 7 + 1, i % 5 + 1)).sum.toLong
    val np = (0 until n).map(i => i % 7 + 1).sum
    val nr = (0 until n).map(i => i % 5 + 1).sum
    val row = EvalScoring.scorePairs(
        Seq((1L, pred, ref)).toDF("pair_id", "pred", "ref"))
      .collect().head
    assert(row.getLong(2) == expOv, s"overlap ${row.getLong(2)} != $expOv")
    val expF1 = math.floor(2.0 * expOv / (np + nr) * 10000 + 0.5) / 10000
    assert(row.getDouble(3) == expF1)
    assert(row.getLong(1) == 0L) // not an exact match
  }

  test("token F1 handles empty and identical sides") {
    val byId = EvalScoring.scorePairs(Seq(
        (1L, "", ""),               // both empty: f1 defined as 0
        (2L, "a b a", "a a b"),     // same multiset, different order
        (3L, "a", "")).toDF("pair_id", "pred", "ref"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(byId(1L) == ((1L, 0L, 0.0)))
    assert(byId(2L) == ((0L, 3L, 1.0)))
    assert(byId(3L) == ((0L, 0L, 0.0)))
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
