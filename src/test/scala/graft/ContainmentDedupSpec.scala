package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Containment dedup (dedup_containment): the oracle gate pins the
  * fixture algebra; this spec pins the REASON the operator exists —
  * a short document wholly quoted inside a long one is flagged at
  * containment ~1.0 while its Jaccard sits far below every Jaccard
  * gate's threshold. Synthetic corpora go through a real parquet
  * round trip so the operator runs its production load path.
  */
class ContainmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cont").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a short doc quoted inside a long one is flagged at containment 1.0 despite tiny Jaccard") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (1 to 200).map(i => s"f$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, quote),                     // the short doc
      (2L, filler + " " + quote),      // quotes it verbatim in a long doc
      (3L, (1 to 50).map(i => s"z$i").mkString(" "))))
    val out = Dedup.qDedupContainment(spark, dir).collect()
    val row = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(row.isDefined, s"contained pair not flagged: ${out.mkString(",")}")
    assert(row.get.getAs[Double]("containment_ab") == 1.0)
    // the same pair is invisible to the Jaccard gate's 0.8 threshold
    val jac = Dedup.qDedupNgramJaccard(spark, dir).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "Jaccard at 0.8 should NOT flag the quoted pair — that's containment's job")
    // and the unrelated doc pairs with nothing
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("symmetric duplicates carry both directions at 1.0") {
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val dir = corpusDir(Seq((10L, text), (20L, text)))
    val out = Dedup.qDedupContainment(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("containment_ab") == 1.0)
    assert(out.head.getAs[Double]("containment_ba") == 1.0)
  }

  test("the size predicate prunes candidates but never a pair that verifies") {
    // the shape the predicate exists for: a LARGE doc whose PREFIX
    // includes a shingle also held by much SMALLER docs — candidates
    // in the (big prefix a, small posting b) direction violate
    // ns_b ≥ ⌈t·ns_a⌉ and can never verify, so pruning them is free.
    // Prefixes are rarest-first (df ascending), so the big doc's body
    // is shared by all 40 fillers (df≈41 — common) while the marker's
    // df is 6 (big + 5 tinies): big's 3-shingle prefix = its two
    // unique boundary windows + the marker, putting the marker in
    // play against the tiny marker-holders.
    val marker = "aa1 aa2 aa3"
    val body = (1 to 20).map(j => s"zz_$j").mkString(" ")
    val big = s"$body $marker"
    val tinies = (0 until 5).map(k => (200L + k, s"$marker b_$k"))
    val fillers = (1L to 40L).map(i => (i, s"$body f${i}_a f${i}_b f${i}_c"))
    val dir = corpusDir(fillers ++ tinies :+ (300L, big))
    val d = graft.Tables.documents(spark, dir)
    val pruned = Dedup.containmentCandidates(d, sizePrune = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unpruned = Dedup.containmentCandidates(d, sizePrune = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.subsetOf(unpruned))
    assert(pruned.size < unpruned.size,
      s"predicate should bite on this fixture: ${pruned.size} vs ${unpruned.size}")
    // losslessness: every pair the FULL candidate set verifies is
    // still found when the search runs over the pruned candidates
    val verified = Dedup.qDedupContainment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(pruned),
      s"pruning lost verified pairs: ${(verified -- pruned).mkString(",")}")
  }
}
