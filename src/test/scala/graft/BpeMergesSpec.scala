package graft

import graft.operators.TextAnalysis

/** BPE merge induction (text_bpe_merges): the oracle gate pins the
  * fixture's 3-step merge table; this spec pins the algorithmic
  * contracts on hand-built corpora — frequency-weighted pair counts,
  * the lexicographic tie-break, greedy LEFT-TO-RIGHT non-overlapping
  * rewriting (the "aaa" run case), and that later steps see merged
  * symbols as atoms.
  */
class BpeMergesSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], steps: Int) =
    TextAnalysis.bpeMerges(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), steps)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getLong(4)))

  test("most frequent pair wins, weighted by word frequency") {
    // "ab" appears 3 times (pair a-b ×3); "cd" twice
    val m = merges(Seq("ab ab ab cd cd"), 1)
    assert(m.head == ((1L, "a", "b", "ab", 3L)))
  }

  test("ties break to the lexicographically smallest pair") {
    // pairs xy and ab each count 2 — ab must win
    val m = merges(Seq("xy xy ab ab"), 1)
    assert(m.head._2 == "a" && m.head._3 == "b")
  }

  test("a run merges greedily left-to-right: 'aaaa' counts pair (a,a) three times, merges twice") {
    // word "aaaa": adjacent pairs (a,a) at 3 positions
    val m1 = merges(Seq("aaaa"), 2)
    assert(m1(0) == ((1L, "a", "a", "aa", 3L)))
    // after the greedy rewrite "aaaa" -> [aa, aa]; the next-best pair
    // is (aa, aa) with count 1 — NOT (a, a) again, and not (aa, a)
    // (which a non-greedy rewrite [aa, a, ...] would produce)
    assert(m1(1) == ((2L, "aa", "aa", "aaaa", 1L)))
  }

  test("odd run leaves the tail symbol unmerged: 'aaa' -> [aa, a]") {
    val m = merges(Seq("aaa bbb ccc aaa"), 2)
    assert(m(0) == ((1L, "a", "a", "aa", 4L)))
    // rewritten vocab: aaa->[aa,a] (x2 freq... one type), bbb->[bb,b],
    // ccc->[cc,c]; surviving pairs all count: (aa,a)=2 beats others
    assert(m(1) == ((2L, "aa", "a", "aaa", 2L)))
  }

  test("applying the learned merges compresses: words <= symbols <= chars, strictly fewer symbols than chars") {
    val out = TextAnalysis.qTextBpeApply(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, c, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= s && s <= c, s"doc ${r.getLong(0)}: words=$w symbols=$s chars=$c")
    }
    val totalChars = out.map(_.getLong(2)).sum
    val totalSyms = out.map(_.getLong(3)).sum
    assert(totalSyms < totalChars, "three learned merges must compress the corpus")
  }

  test("merged symbols are atoms in later steps") {
    // step 1 merges (e,r); step 2 must be able to pair the merged
    // 'er' with a neighbor as one symbol
    val m = merges(Seq("ter ter ter xy"), 2)
    assert(m(0)._4 == "er" || m(0)._4 == "te")
    val step2 = m(1)
    assert(step2._2.length + step2._3.length == step2._4.length)
    assert(step2._4 == "ter", s"expected 'ter' from ${step2}")
  }
}
