package graft

import graft.operators.{Mixing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Edge contracts of the content-hash split and the unigram-LM scorer
  * that the sf0.01 oracle gates can't reach: duplicate texts
  * co-splitting (the leak-prevention property the content keying
  * exists for), the zero-OOV-mass log floor, and empty-document
  * scoring. Synthetic corpora are written as documents.parquet into a
  * temp dir so the operators run their REAL load path. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hash split partitions the fixture corpus with in-range buckets") {
    val out = Mixing.qHashSplit(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length == total)
    assert(out.forall { r =>
      val b = r.getLong(1); b >= 0 && b < 100 })
    val bySplit = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // 90/5/5 in expectation; at 200 docs just pin train majority
    assert(bySplit("train") > total / 2)
  }

  test("exact-duplicate texts land in the same split — content keying prevents boundary leaks") {
    // 40 distinct payloads, each present twice under different ids
    val texts = Seq.tabulate(40)(i => s"payload $i " + ("x " * i))
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t), ((i + 1000).toLong, t)) }
    val dir = corpusDir(rows)
    val out = Mixing.qHashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    texts.zipWithIndex.foreach { case (_, i) =>
      assert(out(i.toLong) == out((i + 1000).toLong), s"payload $i straddles splits")
    }
  }

  test("unigram LM: fixture scoring is negative, OOV genuinely exercised, in-vocab mass dominates") {
    val out = TextAnalysis.qTextUnigramLogprob(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(3) < 0.0))
    // the V=16 dial against the 31-token fixture vocabulary must
    // leave real OOV hits — if a fixture regen shrinks the
    // vocabulary under V, the OOV path silently stops being tested
    assert(out.map(_.getLong(2)).sum > 0, "no OOV tokens scored — raise the dial's bite")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("zero OOV mass falls back to the ln(1/N) floor instead of ln(0)") {
    // 3 token types <= V=16: every token is in-vocab, OOV mass is 0
    val dir = corpusDir(Seq((0L, "aa bb aa"), (1L, "bb cc"), (2L, "aa")))
    val out = TextAnalysis.qTextUnigramLogprob(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.forall { case (_, _, oov, alp) =>
      oov == 0L && !alp.isNaN && !alp.isInfinite && alp < 0.0 })
    // doc 2 is pure "aa" (3 of 6 tokens): avg = ln(3/6) exactly
    val d2 = out.find(_._1 == 2L).get._4
    assert(math.abs(d2 - math.floor(math.log(0.5) * 1e4 + 0.5) / 1e4) < 1e-12)
  }

  test("chunking covers every token: tail survives, overlap is the stride gap, short docs are one chunk") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .toMap
    val chunks = TextAnalysis.qTextChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val n = docs(id).length
      val sorted = cs.sortBy(_._2)
      // chunk 0 starts at 0; starts advance by exactly the stride
      assert(sorted.head._3 == 0L)
      sorted.zipWithIndex.foreach { case ((_, _, start, len, text), i) =>
        assert(start == i * 24L)
        // chunk text IS the token slice it claims
        assert(text == docs(id).slice(start.toInt, start.toInt + len.toInt)
          .mkString(" "))
      }
      // tail coverage: the last chunk ends at n — no token is dropped
      val (_, _, lastStart, lastLen, _) = sorted.last
      assert(lastStart + lastLen == n, s"doc $id tail lost")
      // short docs are exactly one chunk
      if (n <= 32) assert(sorted.length == 1, s"doc $id n=$n split needlessly")
      else assert(sorted.length == 1 + math.ceil((n - 32) / 24.0).toInt)
    }
  }

  test("an empty document chunks to one empty chunk, not zero rows") {
    val dir = corpusDir(Seq((0L, "a b c"), (1L, "")))
    val out = TextAnalysis.qTextChunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(out.toSet == Set((0L, 3L, "a b c"), (1L, 0L, "")))
  }

  test("chunked pretrain composes the stages: held-out docs absent, offsets contiguous, chunk tokens account exactly") {
    import graft.operators.{Dedup, Pipeline}
    val out = Pipeline.qChunkedPretrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // held-out buckets never leak into the packed stream
    val splits = Mixing.qHashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.forall { case (id, _, _, _, _) => splits(id) == "train" })
    // (seq_id, seq_offset) is one contiguous token prefix over the
    // (doc, chunk) pack order — the packing contract end to end
    var run = 0L
    out.sortBy(t => (t._1, t._2)).foreach { case (d, c, n, sid, soff) =>
      assert(sid == run / 256 && soff == run % 256,
        s"doc $d chunk $c: offset break at $run")
      run += n
    }
    // per-doc accounting: Σ chunk tokens = clean length + 8·(chunks−1)
    // (the deliberate 8-token overlap, tail chunk short) — any drift
    // means chunking and rewrite disagree about the text
    val cleanLen = Dedup.qVerbatimRewrite(spark, sf).collect()
      .filter(r => splits(r.getLong(0)) == "train")
      .map(r => r.getLong(0) ->
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong).toMap
    out.groupBy(_._1).foreach { case (id, cs) =>
      val total = cs.map(_._3).sum
      assert(total == cleanLen(id) + 8L * (cs.length - 1),
        s"doc $id: chunk tokens $total vs clean ${cleanLen(id)} over ${cs.length} chunks")
    }
    // docs fully consumed by dedup produce no packed rows at all
    val packedIds = out.map(_._1).toSet
    cleanLen.filter(_._2 == 0L).keys.foreach(id =>
      assert(!packedIds(id), s"empty doc $id packed"))
  }

  test("streamed chunk-pack is split-invariant: 1-batch, 5-batch, and the batch chain all agree") {
    import graft.streaming.StreamReplays
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val one = rows(StreamReplays.streamChunkPack(spark, sf, nChunks = 1))
    val five = rows(StreamReplays.streamChunkPack(spark, sf, nChunks = 5))
    assert(one == five, "micro-batch split changed the packed stream")
    // and the single-batch replay IS the batch chain (split → chunk →
    // pack) — the token prefix carried across batches reconstructs
    // the one-shot pack exactly
    import graft.operators.{Mixing, Packing, TextAnalysis}
    import org.apache.spark.sql.functions._
    val nDocs = graft.Tables.parquetRowCount(spark, s"$sf/documents.parquet")
    val batch = rows(Packing.packFromCounts(
        TextAnalysis.chunkDocs(
            spark.read.parquet(s"$sf/documents.parquet")
              .where(Mixing.hashBucket(col("text")) < 90))
          .where(col("n_chunk_tokens") > 0)
          .select((col("doc_id") * 256 + col("chunk_id")).as("doc_id"),
                  col("n_chunk_tokens")),
        "n_chunk_tokens", nDocs)
      .select(expr("doc_id DIV 256"), pmod(col("doc_id"), lit(256L)).cast("long"),
              col("n_bpe_tokens"), col("seq_id"), col("seq_offset"))
      .orderBy(col("doc_id")))
    assert(one.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
      == batch.sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])))
  }

  test("an empty document scores 0.0 with zero tokens, not NaN") {
    val dir = corpusDir(Seq((0L, "some normal text here"), (1L, "")))
    val rows = TextAnalysis.qTextUnigramLogprob(spark, dir).collect()
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(empty.getLong(1) == 0L && empty.getDouble(3) == 0.0)
    assert(rows.find(_.getLong(0) == 0L).get.getDouble(3) < 0.0)
  }

  test("eval ECE routes zero-token docs to conf 0.0 / bin 0, not NULL") {
    // an empty and a whitespace-only doc have no token ratios — the
    // guard pins conf to 0.0 so they land (uncounted as correct) in
    // bin 0 instead of producing a NULL bin the oracle would diverge on
    val dir = corpusDir(Seq(
      (0L, "the quick brown fox and the lazy dog of the north"),
      (1L, ""), (2L, "   ")))
    val rows = graft.operators.EvalScoring.qEvalEce(spark, dir).collect()
    assert(rows.forall(r => !r.isNullAt(0)), "NULL bin leaked")
    val bin0 = rows.find(_.getLong(0) == 0L).get
    assert(bin0.getLong(1) == 2L, "both zero-token docs belong to bin 0")
    assert(bin0.getDouble(2) == 0.0, "zero-token conf must be exactly 0.0")
  }
}
