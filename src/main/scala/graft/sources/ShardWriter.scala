package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard export — the terminal sink of the curation
  * pipeline: packed sequences ([[graft.operators.Packing]] output:
  * doc_id, n_bpe_tokens, seq_id, seq_offset) land on disk as
  * size-bounded parquet shards plus a driver-written manifest, the
  * layout a training loader actually consumes (shard = the unit of
  * loader I/O and of resumable progress; the manifest is how the
  * loader knows total tokens without scanning data files).
  *
  * Shard assignment is `seq_id DIV seqsPerShard` — integer division
  * on the packing order, so shards are contiguous in training order
  * and the assignment is a map-only projection (no ordering pass:
  * seq_id already IS the canonical order). The write clusters on the
  * shard column first, so each shard lands in one file per shard
  * (the hash-clustered exchange is the write's only shuffle, sized
  * by `spark.sql.shuffle.partitions` — at 100 TB the shard count
  * dwarfs the task count and each task streams its shards
  * sequentially).
  *
  * The manifest is computed by READING BACK the written files — one
  * extra pass over the compacted output (cheaper than the input: the
  * packed frame is 4 narrow columns), and it doubles as a
  * verify-after-write: stats come from what is actually on disk, not
  * from what the writer intended. Per-shard `content_hash` is an
  * ORDER-INDEPENDENT checksum (sum of per-row xxhash64 over all four
  * columns) so two exports of the same data compare equal regardless
  * of task scheduling; shard count is bounded (totalSeqs /
  * seqsPerShard), so collecting one stat row per shard is driver-safe
  * the same way the k-row model collects are. */
object ShardWriter {

  case class ShardStat(shardId: Long, nDocs: Long, nSeqs: Long,
                       nTokens: Long, contentHash: Long)
  case class Manifest(totalDocs: Long, totalSeqs: Long, totalTokens: Long,
                      shards: Seq[ShardStat])

  /** Write `packed` as parquet partitioned by shard under `outDir`,
    * then read back and return (and persist as `_manifest.json`) the
    * per-shard manifest. */
  def writeShards(packed: DataFrame, outDir: String,
                  seqsPerShard: Long): Manifest = {
    require(seqsPerShard > 0, s"seqsPerShard must be positive: $seqsPerShard")
    val spark = packed.sparkSession
    val withShard = packed
      .withColumn("shard", expr(s"seq_id DIV ${seqsPerShard}L"))
    withShard
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)

    // read-back with the writer's own schema: an EMPTY export writes
    // no part files, and schema inference over nothing throws — an
    // empty corpus must yield an empty manifest, not a crash
    val stats = statsOf(spark.read.schema(withShard.schema).parquet(outDir))
    val m = Manifest(stats.map(_.nDocs).sum, stats.map(_.nSeqs).sum,
      stats.map(_.nTokens).sum, stats)
    writeManifestJson(m, outDir)
    m
  }

  /** Per-shard stats of a read-back shard frame, collected (one row
    * per shard — bounded). The partition column comes back
    * type-inferred (int for small ids), so it is pinned to the long
    * the manifest declares. */
  private def statsOf(onDisk: DataFrame): Seq[ShardStat] =
    onDisk
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("seq_id")).as("n_seqs"),
        sum(col("n_bpe_tokens")).as("n_tokens"),
        // per-row hashes sum in decimal(38,0) — a long sum of 2^63-range
        // hashes overflows under ANSI after a handful of rows — then
        // fold back to a long ring for the manifest field
        pmod(sum(xxhash64(col("doc_id"), col("seq_id"), col("seq_offset"),
            col("n_bpe_tokens")).cast("decimal(38,0)")),
          lit(Long.MaxValue).cast("decimal(38,0)"))
          .cast("long").as("content_hash"))
      .orderBy(col("shard"))
      .collect()
      .map(r => ShardStat(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq

  /** Continuous export: append one micro-batch of packed rows to an
    * existing shard layout and return the merged manifest. The
    * companion of the streaming chunk-and-pack assembly
    * ([[graft.streaming.StreamReplays]]): batches arrive with
    * strictly growing seq_ids (the running-token-prefix contract), so
    * a batch touches only the tail shards — the boundary shard it
    * extends plus the new ones it opens. Stats recompute reads ONLY
    * those shards back (the `shard IN (...)` predicate prunes
    * partition directories, so the scan is bounded by the batch's
    * span, never the corpus); untouched entries carry over from
    * `prior` verbatim.
    *
    * Cross-batch state is the prior [[Manifest]], held by the caller
    * across batches exactly like the replay harness holds the running
    * token total — there is no hidden driver-side catalog, and a
    * crashed exporter rebuilds the manifest with [[writeShards]]-style
    * full read-back. Appending a batch that REWRITES rows already
    * exported is the caller's bug; this sink only ever adds files. */
  def appendShards(batch: DataFrame, outDir: String, seqsPerShard: Long,
                   prior: Manifest): Manifest = {
    require(seqsPerShard > 0, s"seqsPerShard must be positive: $seqsPerShard")
    val spark = batch.sparkSession
    val withShard = batch
      .withColumn("shard", expr(s"seq_id DIV ${seqsPerShard}L"))
    withShard
      .repartition(col("shard"))
      .write.mode(SaveMode.Append).partitionBy("shard").parquet(outDir)

    // bounded collect: distinct shard ids in ONE batch (~batch tokens
    // / shard tokens rows), not the corpus's shard count
    val touched = withShard.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).sorted
    val recomputed = statsOf(spark.read.parquet(outDir)
      .where(col("shard").cast("long").isin(touched: _*)))
    val touchedSet = touched.toSet
    val merged = (prior.shards.filterNot(s => touchedSet(s.shardId)) ++
      recomputed).sortBy(_.shardId)
    val m = Manifest(merged.map(_.nDocs).sum, merged.map(_.nSeqs).sum,
      merged.map(_.nTokens).sum, merged)
    writeManifestJson(m, outDir)
    m
  }

  private def writeManifestJson(m: Manifest, outDir: String): Unit = {
    def shardJson(s: ShardStat) =
      s"""{"shard_id":${s.shardId},"n_docs":${s.nDocs},"n_seqs":${s.nSeqs},""" +
      s""""n_tokens":${s.nTokens},"content_hash":${s.contentHash}}"""
    val json =
      s"""{"total_docs":${m.totalDocs},"total_seqs":${m.totalSeqs},""" +
      s""""total_tokens":${m.totalTokens},"shards":[""" +
      m.shards.map(shardJson).mkString(",") + "]}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "_manifest.json"), json)
  }
}
