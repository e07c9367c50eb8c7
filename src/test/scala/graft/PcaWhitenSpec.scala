package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors
import graft.functions.GramMatrix

/** Gram / PCA whitening: the emb_gram oracle pins the partial-agg
  * second-moment algebra; this spec pins what the oracle can't —
  * the driver-side eigensolve, the whitening identity (cov(w) = I),
  * and the rank-deficiency clamp (a dead axis whitens to zero, never
  * to 1/√0).
  */
class PcaWhitenSpec extends SparkSpec {

  import spark.implicits._

  test("jacobi eigensolve recovers a known spectrum") {
    // diag(5, 2, 1) rotated by a known Givens rotation in the (0,1)
    // plane: eigenvalues must come back (5, 2, 1) descending and
    // eigenvectors must diagonalize the input
    val c = math.cos(0.7); val s = math.sin(0.7)
    val d = Array(5.0, 2.0, 1.0)
    // A = R diag R^T with R = rot(0,1,0.7)
    val r = Array(
      Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (vals, vecs) = Vectors.jacobiEigen(a)
    assert(vals.zip(Seq(5.0, 2.0, 1.0)).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    // Q^T A Q = diag(vals)
    for (i <- 0 until 3; j <- 0 until 3) {
      val qaq = (0 until 3).flatMap(p => (0 until 3).map(q =>
        vecs(p)(i) * a(p)(q) * vecs(q)(j))).sum
      val want = if (i == j) vals(i) else 0.0
      assert(math.abs(qaq - want) < 1e-9, s"QAQ($i,$j)=$qaq want $want")
    }
  }

  test("whitened fixture embeddings have identity covariance") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count().toDouble
    val w = Vectors.whiten(emb)
    val gram = w.agg(GramMatrix(64, col("w")).as("g"))
      .head().getSeq[Double](0)
    // whiten centers, so the second moment IS n·cov; cov must be I
    var maxDiagErr = 0.0; var maxOffErr = 0.0
    for (j <- 0 until 64; k <- 0 until 64) {
      val cov = gram(j * 64 + k) / n
      if (j == k) maxDiagErr = math.max(maxDiagErr, math.abs(cov - 1.0))
      else maxOffErr = math.max(maxOffErr, math.abs(cov))
    }
    assert(maxDiagErr < 1e-6, s"diag err $maxDiagErr")
    assert(maxOffErr < 1e-6, s"off-diag err $maxOffErr")
  }

  test("rank-deficient corpus whitens finitely: dead axes go to zero") {
    // duplicate coordinate 1 into coordinate 0 → a zero-variance
    // direction (x0 − x1); the eps clamp must zero it, not blow up
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        (x, i) => when(i === 0, element_at(col("embedding"), 2).cast("double"))
          .otherwise(x)).as("embedding"))
    val w = Vectors.whiten(emb)
    val bad = w.select(explode(col("w")).as("x"))
      .filter(isnan(col("x")) || col("x") === Double.PositiveInfinity ||
        col("x") === Double.NegativeInfinity)
      .count()
    assert(bad == 0L)
    // and the whitened second moment still has a zero row for the
    // dead direction (63 live axes at variance 1, one at 0)
    val n = emb.count().toDouble
    val gram = w.agg(GramMatrix(64, col("w")).as("g")).head().getSeq[Double](0)
    val diag = (0 until 64).map(j => gram(j * 64 + j) / n)
    assert(diag.count(v => math.abs(v - 1.0) < 1e-6) == 63, s"live axes: $diag")
    assert(diag.count(v => math.abs(v) < 1e-6) == 1)
  }
}
