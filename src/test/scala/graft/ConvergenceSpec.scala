package graft

import graft.operators.Clustering

/** The k-means convergence stop: iteration halts at the Lloyd fixed
  * point (centroids bitwise-unchanged after the shared HALF-UP
  * rounding) instead of burning the full budget. Exactness of the
  * fixed-point test is what keeps the gate's oracle — which unrolls a
  * FIXED iteration count — valid: stopping early can only happen when
  * every skipped iteration would have been a no-op.
  */
class ConvergenceSpec extends SparkSpec {

  test("localCheckpointNoStats is a stats barrier: join-product sizes do not compound across rounds") {
    import org.apache.spark.sql.graft.ColumnBridge
    val s = spark; import s.implicits._
    var df = ColumnBridge.localCheckpointNoStats(
      spark.range(64).toDF("id"))
    val baseline = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // the built-in lazy localCheckpoint carries origin stats, so a
    // checkpoint-in-a-self-join-loop SQUARES the carried size each
    // round (digits double per round; Spark's stats visitor overflows
    // BigInteger past ~31 rounds — hit for real by the k=5 mutual-kNN
    // quality probe). Ten barriered rounds must stay at the baseline.
    for (_ <- 1 to 10) {
      val joined = df.as("a").join(df.as("b"),
          $"a.id" === $"b.id").select($"a.id".as("id"))
      df = ColumnBridge.localCheckpointNoStats(joined)
      assert(df.count() == 64)
      val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sz == baseline,
        s"stats leaked through the barrier: $sz vs baseline $baseline")
    }
  }

  test("connected components converge on a chain that needs several propagation rounds") {
    val s = spark; import s.implicits._
    // a 512-node chain: min-label propagation with pointer
    // shortcutting needs ~log2(n) rounds — the multi-round regime the
    // stats barrier exists for (single-round gates would mask a
    // planning-time regression)
    val edges = (0L until 511L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = graft.operators.Dedup.connectedComponents(edges)
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 512)
    assert(labels.values.forall(_ == 0L), "chain must collapse to one component")
  }

  test("pre-converged corpus stops after one iteration of a 100-budget") {
    val s = spark; import s.implicits._
    // two exact point-masses whose first-2 init IS the fixed point
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val (res, ran) = Clustering.kmeansWithStats(emb, k = 2, iters = 100)
    assert(ran == 1, s"expected early stop after 1 iteration, ran $ran")
    assert(res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("an unconverged corpus still runs its full budget (gate config unaffected)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (_, ran) = Clustering.kmeansWithStats(emb, k = 8, iters = 2)
    assert(ran == 2, s"fixture is unconverged at 2 iterations, ran $ran")
  }

  test("no-collect joined path stops at the same fixed point with identical output") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // the distributed (full-outer-join) convergence test must fire on
    // the pre-converged corpus exactly like the driver-side compare
    val (res, ran) = Clustering.kmeansJoinedWithStats(emb, k = 2, iters = 100)
    assert(ran == 1, s"expected early stop after 1 iteration, ran $ran")
    assert(res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("joined and literal paths converge after the same iteration count on the fixture") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (resL, ranL) = Clustering.kmeansWithStats(emb, k = 8, iters = 50)
    val (resJ, ranJ) = Clustering.kmeansJoinedWithStats(emb, k = 8, iters = 50)
    // same arithmetic, same rounding, same stop rule — the two shapes
    // must execute the same number of Lloyd passes and agree bitwise
    assert(ranJ == ranL, s"literal ran $ranL, joined ran $ranJ")
    assert(resJ.collect().toSeq == resL.collect().toSeq)
  }

  test("budget beyond the fixed point is a no-op: converged result identical under a larger cap") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (resA, ranA) = Clustering.kmeansWithStats(emb, k = 8, iters = 50)
    assert(ranA < 50, s"fixture should converge within 50 iterations, ran $ranA")
    val (resB, ranB) = Clustering.kmeansWithStats(emb, k = 8, iters = ranA + 10)
    assert(ranB == ranA)
    assert(resA.collect().toSeq == resB.collect().toSeq)
  }
}
