package graft

import graft.operators.TextAnalysis

/** SFT chat-turn rendering with loss-mask spans (text_sft_spans):
  * the oracle gate pins the rows; this spec pins the span algebra —
  * spans tile the rendered string exactly (contiguous, gap-free,
  * starting at 0), reconstruction from pieces matches the span
  * arithmetic, and the loss mask alternates user → assistant.
  */
class SftSpansSpec extends SparkSpec {

  private lazy val rows = TextAnalysis.qSftSpans(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
      r.getLong(4), r.getLong(5), r.getBoolean(6)))

  test("spans tile each rendered doc: start 0, contiguous, gap-free") {
    rows.groupBy(_._1).foreach { case (doc, turns) =>
      val sorted = turns.sortBy(_._2)
      assert(sorted.head._5 == 0L, s"doc $doc")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 == b._5, s"doc $doc gap at turn ${b._2}")
        case _ =>
      }
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"doc $doc turn indices")
    }
  }

  test("span length equals role tag + chunk; loss alternates with role") {
    rows.foreach { case (doc, idx, role, chunk, s, e, loss) =>
      val tag = if (role == "user") 8 else 13
      assert(e - s == tag + chunk.length, s"doc $doc turn $idx")
      assert(role == (if (idx % 2 == 0) "user" else "assistant"))
      assert(loss == (role == "assistant"))
    }
  }

  test("reconstructed render matches the original token stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.groupBy(_._1).foreach { case (doc, turns) =>
      val fromTurns = turns.sortBy(_._2).flatMap(t => t._4.split("\\s+")).toSeq
      val original = docs(doc).trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(fromTurns == original, s"doc $doc token stream")
    }
  }
}
