package graft

import graft.functions.PqRecon
import org.apache.spark.sql.functions.col

/** The product-quantization contract (PqRecon): encode+reconstruct
  * pinned against a plain-Scala reference (subspace slicing, squared-L2
  * argmin, ties to the lower codebook id), the model-configuration
  * refusal (subspaces must cut the dim evenly), and the short-vector
  * rule (compare on the overlapping prefix, recon always full length).
  * The end-to-end search semantics are oracle-gated (sim_ivf_pq /
  * sim_ivf_pq_scaled unroll the same algorithm in DuckDB); this spec
  * pins the kernel algebra the oracles can't isolate.
  */
class PqReconSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: per subspace, the codeword minimizing
    * squared L2 against the input slice (ties -> earlier codeword in
    * ascending-id order), concatenated. */
  private def pqRef(v: Array[Float], codebook: Seq[(Long, Array[Double])],
                    numSub: Int): Array[Double] = {
    val sorted = codebook.sortBy(_._1).toIndexedSeq
    val dSub = sorted.head._2.length / numSub
    (0 until numSub).flatMap { m =>
      val base = m * dSub
      // explicit (dist, index) order so the reference's tie rule is
      // the CONTRACT's (lower codebook position wins)
      val scored = sorted.zipWithIndex.map { case ((_, cw), idx) =>
        val n = math.min(dSub, math.max(0, v.length - base))
        var d = 0.0; var i = 0
        while (i < n) {
          val x = v(base + i).toDouble - cw(base + i); d += x * x; i += 1
        }
        (d, idx)
      }
      val winner = scored.minBy { case (d, idx) => (d, idx) }._2
      sorted(winner)._2.slice(base, base + dSub)
    }.toArray
  }

  private def run(rows: Seq[Array[Float]], cb: Seq[(Long, Array[Double])],
                  numSub: Int): Seq[Seq[Double]] =
    rows.toDF("v")
      .select(PqRecon.pqRecon($"v", cb, numSub).as("r"))
      .as[Seq[Double]].collect().toSeq

  test("pq_recon matches the squared-L2 argmin reference, ties to the lower codebook id") {
    val rnd = new scala.util.Random(31)
    def fvec(d: Int) = Array.fill(d)(rnd.nextFloat() - 0.5f)
    val cb: Seq[(Long, Array[Double])] =
      Seq.tabulate(16)(j => (j.toLong, fvec(16).map(_.toDouble)))
    // codeword 13 duplicates codeword 4 — every subspace distance
    // ties exactly, and the lower id (4) must be the one written out
    val tied = cb.map { case (id, c) => if (id == 13L) (id, cb(4)._2) else (id, c) }
    val rows = Seq.fill(40)(fvec(16))
    for (numSub <- Seq(1, 2, 4, 8, 16)) {
      val got = run(rows, tied, numSub)
      val want = rows.map(pqRef(_, tied, numSub).toSeq)
      assert(got == want, s"numSub=$numSub")
    }
  }

  test("pq_recon on the fixture embeddings matches the reference (first-16 codebook)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = emb.where(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val rows = emb.limit(60).select(col("embedding"))
      .as[Seq[Float]].collect().map(_.toArray).toSeq
    val got = run(rows, cb, 8)
    val want = rows.map(pqRef(_, cb, 8).toSeq)
    assert(got == want)
    // reconstruction is genuinely lossy on real data (recon != input
    // for non-codebook rows) — otherwise the gate would prove nothing
    assert(got.zip(rows).count { case (r, v) =>
      r != v.map(_.toDouble).toSeq } > 40)
  }

  test("pqDecode(pqCodes(v)) reproduces pqRecon(v) exactly — the stored-index contract") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = emb.where(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val mism = emb.select(
        PqRecon.pqRecon(col("embedding"), cb, 8).as("direct"),
        PqRecon.pqDecode(PqRecon.pqCodes(col("embedding"), cb, 8), cb, 8)
          .as("roundtrip"))
      .where(col("direct") =!= col("roundtrip"))
      .count()
    assert(mism == 0)
    // codes themselves are valid positions for a 16-codeword book
    val codes = emb.select(PqRecon.pqCodes(col("embedding"), cb, 8).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("an uneven subspace cut is refused at plan build") {
    val cb = Seq((0L, Array.fill(10)(0.5)))
    val e = intercept[IllegalArgumentException] {
      PqRecon.pqRecon(col("v"), cb, 4)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("short input vectors compare on the overlapping prefix; recon is always full length") {
    val cb: Seq[(Long, Array[Double])] = Seq(
      (0L, Array(1.0, 1.0, 5.0, 5.0)),
      (1L, Array(2.0, 2.0, 0.0, 0.0)))
    // 2 subspaces of 2 dims; input has only 3 elements, so subspace 1
    // compares on its single overlapping dim: (3-5)^2 < (3-0)^2 -> cw 0
    val got = run(Seq(Array(1.1f, 1.1f, 3.0f)), cb, 2)
    assert(got == Seq(Seq(1.0, 1.0, 5.0, 5.0)))
    // zero overlap (input shorter than the subspace base): every
    // distance is 0.0 -> the tie rule hands it to codeword 0
    val got2 = run(Seq(Array(2.0f, 2.0f)), cb, 2)
    assert(got2 == Seq(Seq(2.0, 2.0, 5.0, 5.0)))
  }
}
