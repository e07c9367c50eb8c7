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
