package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, Vectors}

/** Properties of the corpus-audit operators (cross-source overlap,
  * SQ8 quantization) that the hash oracle can't express: overlap
  * counts on crafted corpora, and the quantizer's error bound —
  * every coordinate must reconstruct within half a quantization
  * step, which the MSE alone doesn't pin. */
class CorpusAuditSpec extends SparkSpec {

  test("source overlap counts exactly the shared 4-gram vocabulary") {
    import spark.implicits._
    val docs = Seq(
      // srcA and srcB share exactly one 4-gram ("p q r s"); srcC is
      // disjoint from both, so it must produce NO pair rows at all
      (1L, "p q r s t", "srcA"),
      (2L, "z1 p q r s", "srcB"),
      (3L, "m n o m n o m", "srcC"),
      // a second srcA doc repeating the shared 4-gram must not
      // double-count it (vocabularies are sets)
      (4L, "p q r s", "srcA"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlap(docs, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("srcA", "srcB", 1L)),
      s"only srcA∩srcB share a 4-gram, got ${out.toSeq}")
    // jaccard = shared / (|A| + |B| − shared): A has {pqrs, qrst},
    // B has {z1pqr, pqrs}, shared 1 → 1/3
    val j = TextAnalysis.sourceOverlap(docs, 4).collect()(0).getDouble(3)
    assert(math.abs(j - 0.3333) < 1e-9, s"jaccard $j != 1/3 rounded")
  }

  test("SQ8 codes reconstruct every coordinate within half a step") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val out = Vectors.qEmbQuantizeSq8(spark, sf).collect()
    assert(out.length == emb.size)
    out.foreach { r =>
      val v = emb(r.getLong(0))
      val scl = (v.max - v.min) / 255.0
      // MSE can't beat per-coordinate max error (scl/2)²; rounded
      // bounds get a rounding-step slack
      assert(r.getDouble(4) <= scl * scl / 4.0 + 1e-8,
        s"vec ${r.getLong(0)}: mse ${r.getDouble(4)} exceeds (step/2)²")
      // code_sum within the representable envelope
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 255L * v.length)
    }
  }

  test("IVF+SQ8 search stays within quantization error of full-precision IVF") {
    val full = operators.Similarity.qSimIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val sq8 = operators.Similarity.qSimIvfSq8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(sq8.size == full.size)
    // same buckets, same candidates — rank shifts only where the
    // quantization error crosses a neighbor gap. On the fixture the
    // gaps are wide: demand ≥90% neighbor recall and a tight sim
    // perturbation bound on the shared pairs (measured max 0.0017)
    val shared = full.keySet intersect sq8.keySet
    assert(shared.size >= (full.size * 9) / 10,
      s"recall ${shared.size}/${full.size} below 90%")
    shared.foreach { k =>
      assert(math.abs(full(k) - sq8(k)) <= 0.01,
        s"pair $k: sq8 sim ${sq8(k)} vs full ${full(k)} — beyond quantization error")
    }
  }

  test("quality classifier matches the hand-computed hash weight on a one-token doc") {
    val out = operators.TextAnalysis.qTextQualityClassifier(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getDouble(1)
      assert(p > 0.0 && p < 1.0, s"prob $p out of (0,1)")
      // the keep verdict is computed on the unrounded prob; at 4dp
      // rounding the two can only disagree within half a step of 0.5
      if (p > 0.5001) assert(r.getBoolean(2))
      if (p < 0.4999) assert(!r.getBoolean(2))
    }
    // hand-compute for crafted one-token docs: a one-token doc's mean
    // weight IS the token weight = (first 6 md5 hex digits % 2001 −
    // 1000)/1000, prob = σ(4·w)
    import spark.implicits._
    val crafted = Seq((0L, "alpha"), (1L, "spark"), (2L, "graft"))
      .toDF("doc_id", "text")
    val got = operators.TextAnalysis.qualityClassifier(crafted)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(0L -> "alpha", 1L -> "spark", 2L -> "graft").foreach { case (id, tok) =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val w = (java.lang.Long.parseLong(md5hex.take(6), 16) % 2001L - 1000L) / 1000.0
      val expected = math.floor((1.0 / (1.0 + math.exp(-4.0 * w))) * 10000 + 0.5) / 10000
      assert(got(id) == expected, s"'$tok': got ${got(id)}, hand-computed $expected")
    }
  }

  test("random projection preserves norms on average (the JL contract)") {
    val orig = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => x * x).sum).toMap
    val proj = operators.Vectors.qEmbProjectRp(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => {
        val y = r.getDouble(2); y * y }).sum }
    assert(proj.size == orig.size)
    // E[‖y‖²] = ‖v‖² for ±1/√d signs; with 500 vectors the mean ratio
    // concentrates tightly even though any single vector can deviate
    val ratios = proj.map { case (id, p) => p / orig(id) }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean strays from 1")
  }

  test("SQ8 quantizes a constant vector to zero codes and zero error") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(7L, Seq.fill(8)(1.25f)),
        org.apache.spark.sql.Row(8L, Seq(0.0f, 2.55f, 1.0f, 0.5f))),
      schema)
    // route through a temp table the operator can read? No — exercise
    // the same expressions via a direct select on the crafted frame
    val emb = df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = graft.operators.Vectors.quantizeSq8(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(7L).getLong(3) == 0L, "constant vector → all-zero codes")
    assert(out(7L).getDouble(4) == 0.0, "constant vector → zero error")
    // max coordinate must code to exactly 255 → code_sum ≥ 255
    assert(out(8L).getLong(3) >= 255L)
  }
}
