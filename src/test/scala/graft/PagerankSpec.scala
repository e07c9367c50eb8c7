package graft

import graft.operators.Graph

/** PageRank on the k-NN graph (sim_pagerank_knn): the oracle gate
  * pins the rows; this spec pins the recurrence on graphs with
  * closed-form answers — a directed cycle is the fixed point
  * (every rank stays exactly 1.0), a star concentrates rank on the
  * hub by the hand-computed amounts, and fringe nodes (no in-edges)
  * settle at 1 − d.
  */
class PagerankSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

  test("a directed cycle is the fixed point: every rank exactly 1.0") {
    val out = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 2)
    assert(out == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("a star concentrates rank on the hub; spokes settle at 1 - d") {
    // a,c,d -> b. Round 1: b = 0.15 + 0.85·3 = 2.7; spokes 0.15.
    // Round 2: b = 0.15 + 0.85·(0.15·3) = 0.5325.
    val r1 = run(Seq((1L, 9L), (2L, 9L), (3L, 9L)), 1)
    assert(r1(9L) == 2.7 && r1(1L) == 0.15)
    val r2 = run(Seq((1L, 9L), (2L, 9L), (3L, 9L)), 2)
    assert(r2(9L) == 0.5325 && r2(2L) == 0.15)
  }

  test("out-degree splits a node's contribution") {
    // 1 -> {2,3}: each gets rank/2. Round 1: 2 and 3 = 0.15+0.85·0.5
    val out = run(Seq((1L, 2L), (1L, 3L)), 1)
    assert(out(2L) == 0.575 && out(3L) == 0.575 && out(1L) == 0.15)
  }

  test("fixture ranks are bounded below by 1 - d and someone is prototypical") {
    val out = Graph.qPagerankKnn(spark, sf).collect().map(_.getDouble(1))
    assert(out.forall(_ >= 0.15))
    assert(out.exists(_ > 1.0), "no node accumulated centrality")
  }
}
