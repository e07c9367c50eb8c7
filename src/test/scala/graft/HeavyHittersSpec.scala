package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Two-pass heavy hitters (text_heavy_hitters): the oracle gate pins
  * the closed-form output; this spec pins the distributed contract —
  * the Misra–Gries candidate pass can NEVER lose a true heavy hitter
  * (for any partition layout, any counter budget), so the
  * exact-verified output equals the brute-force word count's answer
  * even when the counter budget is adversarially tight.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force: the full-shuffle word count the operator avoids. */
  private def brute(docs: org.apache.spark.sql.DataFrame, h: Int) = {
    val tokens = docs.select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
    val total = tokens.count()
    tokens.groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * h >= total)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("MG kernel keeps every item above n/(m+1) on a crafted stream") {
    // 120× "hot", 80× "warm", 200 cold singletons: n = 400, m = 4
    // counters ⇒ guarantee threshold n/(m+1) = 80. hot (120 > 80)
    // must survive; warm sits exactly AT the bound (not strictly
    // above), so only the summary-size and sentinel contracts apply
    // to it.
    val stream = Seq.fill(120)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 200).map(i => s"cold$i")
    val m = 4
    val kept = TextAnalysis.misraGries(stream.iterator, m).toList
    assert(kept.filter(_._1.isEmpty) == List((None, stream.size.toLong)))
    val cands = kept.collect { case (Some(t), _) => t }.toSet
    assert(cands.contains("hot"))
    assert(cands.size <= m)
  }

  test("exact-verified output equals brute force even with a tight counter budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // h = 50: far fewer counters than the corpus has distinct tokens,
    // and an adversarial narrow layout (2 partitions) — MG still may
    // not lose any true hitter, and verification kills false ones
    val got = TextAnalysis.heavyHitters(docs.repartition(2), 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == brute(docs, 50))
  }

  test("output matches brute force across partition layouts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expected = brute(docs, TextAnalysis.HhDen)
    for (parts <- Seq(1, 3, 7)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(parts), TextAnalysis.HhDen)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected, s"layout $parts diverged")
    }
  }

  test("empty corpus yields no heavy hitters") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.heavyHitters(empty, 100).collect().isEmpty)
  }

  test("mgMerge keeps every item above N/(m+1) across an adversarial merge chain") {
    // a true heavy item spread thin across many summaries must
    // survive the overflow cuts: 20 summaries, each with "hot" at 6
    // plus 4 distinct cold entries at 5 — N = 520, m = 4,
    // hot total = 120 > 520/5 = 104
    val summaries = (0 until 20).map { i =>
      Map("hot" -> 6L) ++ (0 until 4).map(j => s"cold${i}_$j" -> 5L)
    }
    val merged = summaries.foldLeft(Map.empty[String, Long]) {
      (acc, s) => s.foldLeft(acc) { case (a, (k, c)) =>
        TextAnalysis.mgMerge(a, Map(k -> c), 4)
      }
    }
    assert(merged.size <= 4)
    assert(merged.contains("hot"), s"merged=$merged")
  }

  test("streaming MG monitor equals the batch gate (same rows)") {
    val batch = TextAnalysis.qHeavyHitters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val stream = graft.streaming.StreamReplays.qStreamHeavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(stream == batch)
  }
}
