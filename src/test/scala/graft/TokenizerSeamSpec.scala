package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextAnalysis}

/** The tokenizer weights-as-table seam, closed end to end (the r12
  * verdict's stretch item): a REAL merge table — trained by the
  * repo's own BPE induction at a production-ish step count — is
  * exported as a catalog table, read back as data, applied through
  * [[TextAnalysis.bpeApplyWith]], and its counts drive the packing
  * budget arithmetic. Pins: the export/import round trip is exact,
  * the apply plan stays shuffle-free, training actually compresses,
  * and the trained counts chain into [[Packing.packFromCounts]]
  * with the two-phase prefix-sum semantics intact.
  */
class TokenizerSeamSpec extends SparkSpec {

  import spark.implicits._

  private val Steps = 40
  private val ExportTable = "bpe_merges_export"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  // train once per suite: 40 real merges off the fixture corpus
  private lazy val trained = TextAnalysis.bpeMerges(docs, Steps).cache()

  test("train -> export-as-table -> consume round-trips exactly") {
    // a previous JVM's warehouse dir can outlive its catalog entry,
    // and saveAsTable refuses a dangling location even in overwrite
    // mode — drop both before writing
    spark.sql(s"DROP TABLE IF EXISTS $ExportTable")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), ExportTable)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    trained.write.mode("overwrite").saveAsTable(ExportTable)
    val direct = TextAnalysis.bpeApplyWith(docs, trained)
      .collect().map(_.toSeq)
    val viaCatalog = TextAnalysis.bpeApplyWith(docs, spark.table(ExportTable))
      .collect().map(_.toSeq)
    assert(direct.toSeq == viaCatalog.toSeq)
  }

  test("broadcast-kernel encoder == codegen fold, symbol for symbol") {
    // same 5-merge table through both paths: bpeApplyWith picks the
    // nested fold at <=ApplyFoldLimit; the big-table kernel is forced
    // directly. Any divergence in the greedy left-to-right chaining
    // semantics shows up here.
    val five = TextAnalysis.bpeMerges(docs, 5)
    val pairs = five.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val fold = TextAnalysis.bpeApplyWith(docs, five)
      .collect().map(_.toSeq)
    val kernel = TextAnalysis.bpeApplyMergesBig(docs, pairs)
      .collect().map(_.toSeq)
    assert(fold.toSeq == kernel.toSeq)
  }

  test("fold/kernel parity holds for ARBITRARY merge tables, not just trained ones (property)") {
    // the kernel transcribes the fold pass-for-pass, so equivalence
    // must hold even for adversarial tables no training would emit
    // (merges that re-merge earlier outputs, duplicate pairs,
    // pairs over multi-char symbols created mid-sequence) — unlike a
    // rank-heap encoder, which is only equivalent for trained tables
    import org.scalacheck.Gen
    import spark.implicits._
    val alpha = Seq("a", "b", "c")
    val wordGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha)).map(_.mkString))
    val docGen = Gen.chooseNum(1, 5)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    // symbols that can exist mid-apply: single chars and short runs
    val symGen = Gen.oneOf("a", "b", "c", "ab", "bc", "aa", "abc")
    val mergesGen = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.zip(symGen, symGen)))
    val seed = new scala.util.Random(20260815)
    (1 to 25).foreach { i =>
      val params = Gen.Parameters.default
        .withSize(10)
      val rng = org.scalacheck.rng.Seed(seed.nextLong())
      val texts = Gen.listOfN(6, docGen)(params, rng).get
      val merges = mergesGen(params, rng.next).get
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val fold = TextAnalysis.bpeApplyMerges(docs, merges)
        .collect().map(_.toSeq)
      val kernel = TextAnalysis.bpeApplyMergesBig(docs, merges)
        .collect().map(_.toSeq)
      assert(fold.toSeq == kernel.toSeq,
        s"case $i diverged for merges=$merges texts=$texts")
    }
  }

  test("the table-fed apply plan is map-only: no hash exchange") {
    val plan = TextAnalysis.bpeApplyWith(docs, trained)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "apply side shuffled — the seam changed the plan")
  }

  test("a 40-merge tokenizer really compresses: words <= symbols < chars, and beats the 3-merge table") {
    val applied = TextAnalysis.bpeApplyWith(docs, trained)
      .agg(sum("n_words"), sum("n_bpe_symbols"), sum("n_chars"))
      .head
    val (words, syms, chars) =
      (applied.getLong(0), applied.getLong(1), applied.getLong(2))
    assert(words <= syms && syms < chars,
      s"trained apply out of range: words=$words syms=$syms chars=$chars")
    val small = TextAnalysis.bpeApplyWith(docs,
        TextAnalysis.bpeMerges(docs, 3))
      .agg(sum("n_bpe_symbols")).head.getLong(0)
    assert(syms < small,
      s"40 merges ($syms symbols) should compress beyond 3 ($small)")
  }

  test("the text_bpe_apply_big gate rides the kernel: fixture exceeds the fold limit and matches a direct kernel call") {
    // the gate's whole point is exercising the big-table route — if
    // the fixture ever shrank under the switch threshold it would
    // silently re-gate the fold
    assert(TextAnalysis.BigMergeFixture.size > 6,
      "fixture no longer routes through bpeApplyMergesBig")
    val viaGate = TextAnalysis.qTextBpeApplyBig(spark, sf)
      .collect().map(_.toSeq).toSeq
    val direct = TextAnalysis.bpeApplyMergesBig(docs,
        TextAnalysis.BigMergeFixture)
      .collect().map(_.toSeq).toSeq
    assert(viaGate == direct)
    // and the kernel plan is still map-only with the 40-merge table
    val plan = TextAnalysis.qTextBpeApplyBig(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("trained counts drive packFromCounts with exact prefix-sum semantics") {
    val applied = TextAnalysis.bpeApplyWith(docs, trained)
    val n = docs.count()
    val packed = Packing.packFromCounts(applied, "n_bpe_symbols", n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // independent oracle: the doc_id-ordered exclusive running sum
    val counts = applied.select("doc_id", "n_bpe_symbols")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val expected = counts.map { case (id, c) =>
      val row = (id, c, cum / 256, cum % 256)
      cum += c
      row
    }
    assert(packed.toSeq == expected.toSeq)
  }
}
