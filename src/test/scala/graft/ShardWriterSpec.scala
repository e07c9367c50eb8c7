package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing
import graft.sources.ShardWriter

/** Shard export: the written layout must round-trip (reading every
  * shard back reassembles exactly the packed input), the manifest
  * must describe what is ON DISK (totals equal recomputed input
  * aggregates; per-shard hashes are order-independent), and shard
  * assignment must be the contiguous training-order rule. */
class ShardWriterSpec extends SparkSpec {

  private def packedFixture() =
    SparkEntry.queries("pack_sequences")(spark, sf)

  test("shards round-trip the packed frame and the manifest matches disk") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val packed = packedFixture()
    val m = ShardWriter.writeShards(packed, out, seqsPerShard = 4)

    // totals describe the input exactly
    val in = packed.agg(count(lit(1)), sum("n_bpe_tokens"),
      countDistinct("seq_id")).collect()(0)
    assert(m.totalDocs === in.getLong(0))
    assert(m.totalTokens === in.getLong(1))
    assert(m.totalSeqs === in.getLong(2))
    assert(m.shards.nonEmpty)

    // every shard holds at most seqsPerShard sequences, and shard ids
    // follow the contiguous seq_id DIV rule
    assert(m.shards.forall(_.nSeqs <= 4))
    val back = spark.read.parquet(out)
    val badShard = back
      .where(col("shard") =!= expr("seq_id DIV 4L")).count()
    assert(badShard === 0L)

    // round trip: the union of shards is exactly the packed input
    val diff = back.select("doc_id", "n_bpe_tokens", "seq_id", "seq_offset")
      .exceptAll(packed).count()
    val diff2 = packed.exceptAll(
      back.select("doc_id", "n_bpe_tokens", "seq_id", "seq_offset")).count()
    assert(diff === 0L && diff2 === 0L)

    // manifest file exists and carries the same totals
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "_manifest.json"))
    assert(json.contains(s""""total_docs":${m.totalDocs}"""))
    assert(json.contains(s""""total_tokens":${m.totalTokens}"""))
  }

  test("batch appends merge to the one-shot manifest, untouched shards carry over") {
    val outInc = java.nio.file.Files.createTempDirectory("shards_inc").toString
    val outOne = java.nio.file.Files.createTempDirectory("shards_one").toString
    val packed = packedFixture().cache()
    try {
      val oneShot = ShardWriter.writeShards(packed, outOne, seqsPerShard = 4)

      // split at a seq boundary that leaves a PARTIAL final shard in
      // batch 1, so batch 2 must extend the boundary shard (the hard
      // case) as well as open new ones
      val b1 = packed.where(col("seq_id") < 6)
      val b2 = packed.where(col("seq_id") >= 6)
      assert(b1.count() > 0 && b2.count() > 0, "fixture must span seq_id 6")
      val m1 = ShardWriter.writeShards(b1, outInc, seqsPerShard = 4)
      val m2 = ShardWriter.appendShards(b2, outInc, seqsPerShard = 4, m1)

      // merged manifest is EXACTLY the one-shot export's
      assert(m2.totalDocs === oneShot.totalDocs)
      assert(m2.totalSeqs === oneShot.totalSeqs)
      assert(m2.totalTokens === oneShot.totalTokens)
      assert(m2.shards.map(s => (s.shardId, s.nDocs, s.nSeqs, s.nTokens,
        s.contentHash)) === oneShot.shards.map(s => (s.shardId, s.nDocs,
        s.nSeqs, s.nTokens, s.contentHash)))

      // shard 0 was untouched by batch 2: its entry carried over from
      // m1 without recompute changing it
      assert(m2.shards.find(_.shardId == 0).map(_.contentHash) ===
             m1.shards.find(_.shardId == 0).map(_.contentHash))

      // and the data on disk round-trips
      val back = spark.read.parquet(outInc)
        .select("doc_id", "n_bpe_tokens", "seq_id", "seq_offset")
      assert(back.exceptAll(packed).count() === 0L)
      assert(packed.exceptAll(back).count() === 0L)
    } finally packed.unpersist()
  }

  test("re-export of identical data yields identical per-shard hashes") {
    val out1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val packed = packedFixture()
    // different task layout on the second write: repartition scrambles
    // row order per partition — the manifest hash must not care
    val m1 = ShardWriter.writeShards(packed, out1, seqsPerShard = 4)
    val m2 = ShardWriter.writeShards(packed.repartition(7), out2,
      seqsPerShard = 4)
    assert(m1.shards.map(s => s.shardId -> s.contentHash) ===
           m2.shards.map(s => s.shardId -> s.contentHash))
    assert(m1.totalTokens === m2.totalTokens)
  }
}
