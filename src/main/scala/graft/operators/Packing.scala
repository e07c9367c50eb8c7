package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** Sequence packing — the concat-and-chunk step of an LLM training
  * pipeline: documents are laid end-to-end in a canonical order and
  * cut into fixed-token-budget training sequences, so each doc is
  * assigned the sequence its first token lands in plus its offset
  * there. The core is a corpus-wide running token offset, i.e. a
  * distributed prefix sum.
  *
  * A naive `sum(n) over (order by doc_id)` is a single-partition
  * window — the WindowExec "moving all data to a single partition"
  * case, unusable beyond one task's memory. This is the standard
  * two-phase prefix sum instead: docs are bucketed by id range into
  * ~√n buckets, the heavy cumulative sum runs per-bucket (parallel,
  * partitioned window), and only the ~√n bucket subtotals go through
  * a global window before being broadcast back. Both levels are √n
  * rows wide, so one task never holds more than ~√n rows of window
  * state; at 10¹² docs that is 10⁶ — and the same trick recurses if
  * even that is too wide.
  */
object Packing {

  /** Tokens per training sequence. Real pipelines use the model's
    * context length (2k–128k); 256 keeps sf-fixture sequences plural. */
  private val SeqTokens = 256L

  /** doc → (sequence id, offset) assignment under concat-and-chunk
    * packing in doc_id order. Bucket width comes from the parquet
    * footer row count (no job; ids sparser than dense only mean more,
    * smaller buckets — ordering, and thus the packing, is unchanged). */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
    packTokens(toks, bucketWidthFor(n))
      .select("doc_id", "n_bpe_tokens", "seq_id", "seq_offset")
      .orderBy("doc_id")
  }

  /** Per-sequence document boundaries — what the training loader
    * needs beside the packed tokens: cross-document attention masking
    * resets attention at each document start, so every sequence ships
    * the offsets where its member documents begin. One hash shuffle
    * on seq_id over the packed assignment (groups bounded by docs per
    * sequence — at most SeqTokens for nonempty docs); boundaries
    * serialize as a comma-joined sorted string, which is both
    * loader-friendly and engine-portable (no array-hash semantics in
    * the oracle compare). `started_tokens` sums the tokens of the
    * docs STARTING in the sequence (a long doc's tail spills into
    * later sequences it is not listed in) — Σ over all sequences
    * equals the corpus token count, the conservation check. */
  def qPackBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
    packTokens(toks, bucketWidthFor(n))
      .groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(transform(sort_array(collect_list(col("seq_offset"))),
          x => x.cast("string")), ",").as("boundaries"),
        sum(col("n_bpe_tokens")).as("started_tokens"))
      .orderBy("seq_id")
  }

  /** PACKING-EFFICIENCY AUDIT — the one-row report a training team
    * reads before committing to a context length: how full the packed
    * stream is and how fragmented attention will be. From the same
    * assignment [[qPackSequences]] ships: total tokens, sequence
    * count, the final sequence's fill (the only padded one under
    * concat-and-chunk — fill_last is the whole padding story),
    * boundary-crossing documents (docs split across ≥2 sequences —
    * each crossing is a truncated attention context) and the total
    * crossings (a doc longer than several windows fragments more than
    * once), the crossing share, and mean doc length. Recomputed at
    * candidate context lengths, these numbers price the
    * fragmentation-vs-padding trade a context-length choice makes.
    *
    * Scale shape: the pack's two-phase prefix sum + ONE global
    * aggregate (partial-agg combined map-side, a single final row) —
    * nothing new materializes; the per-sequence frame never exists. */
  def qPackEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
    val packed = packTokens(toks, bucketWidthFor(n))
      .withColumn("end_off", col("seq_id") * SeqTokens + col("seq_offset")
        + col("n_bpe_tokens") - 1)
      // integer DIV, not `/` (Column./ on longs promotes to double —
      // precision loss past 2^53 tokens, i.e. exactly the scale this
      // report is for); zero-token docs pin end_seq to their own seq
      .withColumn("end_seq",
        when(col("n_bpe_tokens") > 0, expr(s"end_off DIV $SeqTokens"))
        .otherwise(col("seq_id")))
    packed.agg(
        coalesce(sum("n_bpe_tokens"), lit(0L)).as("total_tokens"),
        coalesce(count(lit(1)), lit(0L)).as("n_docs"),
        coalesce(sum(when(col("end_seq") > col("seq_id"), 1L)
          .otherwise(0L)), lit(0L)).as("n_crossing_docs"),
        coalesce(sum(col("end_seq") - col("seq_id")), lit(0L))
          .as("n_crossings"))
      // n_seqs from the TOKEN TOTAL (as qCurationAudit does), not
      // max(end_seq)+1: a trailing zero-token doc pins end_seq to its
      // own (possibly empty) sequence, which last_fill's modulo
      // ignores — deriving both fields from total_tokens keeps the
      // report describing one consistent packed stream
      .withColumn("n_seqs",
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(expr(s"(total_tokens - 1) DIV $SeqTokens") + lit(1L)))
      .select(
        col("total_tokens"), col("n_seqs"), col("n_docs"),
        col("n_crossing_docs"), col("n_crossings"),
        when(col("n_seqs") === 0, lit(0L))
          .otherwise(((col("total_tokens") - 1) % SeqTokens) + 1)
          .as("last_fill"),
        when(col("n_docs") === 0, lit(0.0)).otherwise(Text.roundPortable(
          col("n_crossing_docs").cast("double") / col("n_docs"), 4))
          .as("crossing_share"),
        when(col("n_docs") === 0, lit(0.0)).otherwise(Text.roundPortable(
          col("total_tokens").cast("double") / col("n_docs"), 4))
          .as("avg_doc_tokens"))
  }

  private[graft] def bucketWidthFor(n: Long): Long =
    math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)

  /** Hex-prefix length of the md5 rank used as the hash-bucket key in
    * the two-phase prefix sums: the shortest prefix whose 16^len
    * buckets reach √n, floored at 2 (256 buckets — already wider than
    * any local parallelism). Per-task window state in BOTH phases is
    * then ~√n — phase 1 holds ~n/16^len rows per bucket, phase 2 the
    * ≤16^len non-empty subtotals — the [[bucketWidthFor]] balance.
    * (A fixed 2-hex prefix left phase 1 at n/256, growing linearly
    * with the corpus.) `n` is the WINDOWED row count: the corpus for
    * the global shuffle, the resample target / pruned budget for the
    * mix and epoch-pack variants whose GroupedTopK prune bounds the
    * windowed set below the raw corpus. */
  private[graft] def hashPrefixLenFor(n: Long): Int = {
    val target = math.sqrt(math.max(1L, n).toDouble)
    var len = 2
    var buckets = 256.0
    while (buckets < target && len < 8) { len += 1; buckets *= 16 }
    len
  }

  /** The REAL-TOKENIZER hook: pack from a caller-supplied count
    * column instead of the in-engine regex stand-in. A production
    * pipeline tokenizes once (an external tokenizer, counts
    * materialized as a column) and every downstream budget consumer
    * reads the column — so the packing operator must take counts as
    * data, not recompute them. `docs` needs (doc_id, <countCol>);
    * the plan is [[packTokens]]'s two-phase prefix sum unchanged.
    * Gated as pack_sequences_precounted over the fixture's n_chars
    * column (a genuine precomputed per-doc count). */
  def packFromCounts(docs: DataFrame, countCol: String,
                     totalDocs: Long, baseOffset: Long = 0L): DataFrame =
    packTokens(
      docs.select(col("doc_id"), col(countCol).as("n_bpe_tokens")),
      bucketWidthFor(totalDocs), baseOffset)

  /** [[packFromCounts]] over the fixture's precomputed n_chars —
    * same oracle recipe as pack_sequences with the count column
    * swapped, proving the hook leaves the packing plan unchanged. */
  def qPackSequencesPrecounted(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    packFromCounts(Tables.documents(spark, dir), "n_chars", n)
      .select(col("doc_id"), col("n_bpe_tokens").as("n_tok"),
              col("seq_id"), col("seq_offset"))
      .orderBy("doc_id")
  }

  /** The two-phase prefix-sum pack over any (doc_id, n_bpe_tokens)
    * frame (extra columns ride along): per-bucket exclusive running
    * sums in parallel, a global window over only the ~√n bucket
    * subtotals, broadcast back. Sparse/filtered doc_ids just mean
    * emptier buckets — ordering, and thus the packing, is unchanged. */
  /** `baseOffset` shifts the whole token prefix — the CONTINUATION
    * hook for incremental assembly: a caller packing batch k passes
    * the total token count of batches 0..k−1, and the concatenated
    * outputs equal one pack of the concatenated input (the
    * stream_chunk_pack gate proves it against the batch oracle). */
  private[graft] def packTokens(toks: DataFrame,
                                bucketWidth: Long,
                                baseOffset: Long = 0L): DataFrame = {
    val bucketed = toks.withColumn("bucket",
      (col("doc_id") / bucketWidth).cast("long"))
    // phase 1: per-bucket exclusive running sum — parallel across buckets
    val wIntra = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = bucketed.withColumn("intra_excl",
      sum("n_bpe_tokens").over(wIntra) - col("n_bpe_tokens"))
    // phase 2: exclusive prefix over the ~√n bucket subtotals (the only
    // global window, √n rows), broadcast back onto the docs
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = bucketed.groupBy("bucket")
      .agg(sum("n_bpe_tokens").as("btot"))
      .withColumn("bucket_excl", sum("btot").over(wBucket) - col("btot"))
      .select("bucket", "bucket_excl")
    intra.join(broadcast(prefixes), "bucket")
      .withColumn("start_offset",
        lit(baseOffset) + col("bucket_excl") + col("intra_excl"))
      // integer DIV, not `/`: double division loses exactness once
      // corpus-wide token offsets pass 2^53
      .withColumn("seq_id", expr(s"start_offset DIV $SeqTokens"))
      .withColumn("seq_offset",
        pmod(col("start_offset"), lit(SeqTokens)).cast("long"))
      .drop("bucket", "intra_excl", "bucket_excl", "start_offset")
  }

  /** Deterministic global shuffle — the training-order randomization
    * that runs before packing: every doc gets a pseudorandom but
    * reproducible position 0..n−1 by ranking on md5(doc_id). A global
    * rank is the same single-partition-window trap as the prefix sum
    * above, dodged the same way: docs are bucketed by the hash's
    * first [[hashPrefixLenFor]](n) hex chars (16^len ≈ √n uniform
    * buckets — the hash itself is the balancer, no skew possible),
    * ranked per bucket in parallel, and only the ~√n bucket counts go
    * through a global window before broadcasting back as offsets.
    * Bucket-prefix + intra-bucket rank equals the global rank because
    * the bucket key is a PREFIX of the sort key: ordering by (bucket,
    * rest-of-hash) is ordering by the hash — for ANY prefix length,
    * which is why the fan-out can follow the parquet footer count
    * while positions stay bit-identical (PackingSpec pins the
    * invariance). md5 is engine-portable (the DuckDB oracle replays
    * it) and seeding a different epoch's order is just salting the
    * hashed string. */
  /** CURRICULUM packing — concat-and-chunk in QUALITY order (best
    * first, doc_id ties) instead of doc_id order: the training-order
    * policy curriculum-learning pipelines feed the loader. A global
    * sort-order prefix sum over a NON-ID key is the interesting part
    * at scale: the two-phase trick needs the partition key to be a
    * PREFIX of the sort key, and (quality, doc_id DIV width) is
    * exactly that — quality is already HALF-UP rounded to 4 decimals
    * (≤10⁴+1 distinct values, metadata-sized), and the id-range
    * sub-bucket caps per-task window state at ~[[bucketWidthFor]](n)
    * rows even when the whole corpus shares one quality value (the
    * skew case a bare partitionBy(quality) would die on). Phase 2
    * windows over the (quality, sub-bucket) subtotals — ~√n rows —
    * exactly like the doc_id pack. */
  def qCurriculumPack(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val w = bucketWidthFor(n)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityScoreCol.as("quality"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .withColumn("b2", expr(s"doc_id DIV ${w}L"))
    val wIntra = Window.partitionBy("quality", "b2").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = docs.withColumn("intra_excl",
      sum("n_bpe_tokens").over(wIntra) - col("n_bpe_tokens"))
    val wBucket = Window.orderBy(desc("quality"), col("b2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixes = docs.groupBy("quality", "b2")
      .agg(sum("n_bpe_tokens").as("bt"))
      .withColumn("b_excl", sum("bt").over(wBucket) - col("bt"))
      .select("quality", "b2", "b_excl")
    intra.join(broadcast(prefixes), Seq("quality", "b2"))
      .withColumn("start_offset", col("b_excl") + col("intra_excl"))
      .withColumn("seq_id", expr(s"start_offset DIV $SeqTokens"))
      .withColumn("seq_offset",
        pmod(col("start_offset"), lit(SeqTokens)).cast("long"))
      .select("doc_id", "quality", "n_bpe_tokens", "seq_id", "seq_offset")
      .orderBy("doc_id")
  }

  def qGlobalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    globalShuffleRanked(Tables.documents(spark, dir), hashPrefixLenFor(n))
  }

  /** The rank-by-hash core with the bucket-prefix length exposed —
    * the spec dial proving positions are invariant to the internal
    * fan-out. */
  private[graft] def globalShuffleRanked(docs: DataFrame,
                                         prefixLen: Int): DataFrame = {
    val ranked = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("rk"))
      .withColumn("bucket", substring(col("rk"), 1, prefixLen))
    val wIntra = Window.partitionBy("bucket").orderBy("rk", "doc_id")
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranked.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("offset", sum("bn").over(wBucket) - col("bn"))
      .select("bucket", "offset")
    ranked
      .withColumn("intra_rank", row_number().over(wIntra).cast("long"))
      .join(broadcast(offsets), "bucket")
      .select(col("doc_id"),
        (col("offset") + col("intra_rank") - 1).as("position"))
      .orderBy("doc_id")
  }

  /** WHOLE-DOCUMENT best-fit packing — the no-cross-doc-attention
    * recipe (Ding et al. 2024, "Fewer Truncations Improve Language
    * Modeling"): a sequence holds only COMPLETE documents, so no doc
    * straddles a boundary and the loader needs no attention resets;
    * the price is padding, which [[qPackWholeDocAudit]] reports.
    * Docs longer than the budget are pre-chunked into ≤[[SeqTokens]]
    * pieces first (the paper's recipe — the full-size pieces fill
    * sequences exactly, only the remainder competes for space); every
    * OTHER doc stays whole, which the spec pins.
    *
    * Algorithm: greedy FIRST-FIT-DECREASING within md5 hash buckets.
    * Bin packing is inherently sequential, so the scale unit is the
    * bucket: ~16^[[hashPrefixLenFor]] ≈ √n independent buckets run
    * FFD in parallel via `flatMapGroups` with O(bucket) = O(√n)
    * per-task state (the Misra–Gries imperative-kernel precedent —
    * a global FFD would be a single-task corpus sort). Sequence ids
    * are made globally unique by the same √n-subtotal exclusive
    * prefix the token pack uses: per-bucket bin counts → one
    * metadata-sized window → broadcast back. Sorting DESC inside a
    * bucket is what makes greedy competitive (FFD ≤ 11/9·OPT + 6/9
    * bins per bucket); the md5 bucket split costs packing quality
    * only at the margins (each bucket leaves at most one half-empty
    * bin — the first-fit invariant the spec asserts). */
  def qPackWholeDoc(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_tok"))
    packWholeDocs(docs, hashPrefixLenFor(n))
      .orderBy("doc_id", "piece")
  }

  /** One-row padding/fragmentation report for the whole-doc pack —
    * the [[qPackEfficiency]] twin for the FFD layout: sequence count,
    * padding tokens (n_seqs·budget − total), fill rate, and how many
    * docs the overlong pre-chunking split (the ONLY splits this
    * recipe permits). Read next to pack_efficiency, the two rows
    * price the padding-vs-fragmentation trade between the recipes. */
  def qPackWholeDocAudit(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_tok"))
    // ONE partial-agg pass over the placement: seq ids are contiguous
    // 0..N−1 by construction (bucket-prefix + local bin), so n_seqs is
    // max+1; a split doc contributes exactly one piece #1, so
    // n_split_docs is a filtered count — no per-doc regroup needed
    packWholeDocs(docs, hashPrefixLenFor(n))
      .agg(
        coalesce(sum(when(col("piece") === 0, 1L).otherwise(0L)), lit(0L))
          .as("n_docs"),
        coalesce(count(lit(1)), lit(0L)).as("n_items"),
        coalesce(max("seq_id") + 1, lit(0L)).as("n_seqs"),
        coalesce(sum("n_tok"), lit(0L)).as("total_tokens"),
        coalesce(sum(when(col("piece") === 1, 1L).otherwise(0L)), lit(0L))
          .as("n_split_docs"))
      .select(
        col("n_docs"), col("n_items"), col("n_seqs"), col("total_tokens"),
        col("n_split_docs"),
        (col("n_seqs") * lit(SeqTokens) - col("total_tokens"))
          .as("padding_tokens"),
        when(col("n_seqs") === 0, lit(0.0)).otherwise(Text.roundPortable(
          col("total_tokens").cast("double") / (col("n_seqs") * lit(SeqTokens)),
          4)).as("fill_rate"))
  }

  /** The FFD core with the bucket fan-out exposed (the spec dial:
    * prefixLen 0 = ONE bucket = textbook FFD for the closed-form
    * assertions). Input (doc_id, n_tok); output one row per PIECE
    * with its globally-unique sequence and in-sequence offset. */
  private[graft] def packWholeDocs(docs: DataFrame,
                                   prefixLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = docs
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0L),
          when(col("n_tok") > 0, expr(s"(n_tok - 1) DIV $SeqTokens"))
            .otherwise(lit(0L)))).as("piece"))
      .select(col("doc_id"), col("piece"),
        least(lit(SeqTokens),
          col("n_tok") - lit(SeqTokens) * col("piece")).cast("long").as("tok"))
      .withColumn("bucket",
        substring(md5(col("doc_id").cast("string")), 1, prefixLen))
    // FFD inside each bucket: genuinely sequential greedy state, so an
    // imperative per-group kernel (bucket ≈ √n rows by construction —
    // bounded task memory, the design invariant of this file)
    val placed = pieces.select("bucket", "doc_id", "piece", "tok")
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val items = it.toArray.sortBy { case (_, d, p, t) => (-t, d, p) }
        val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (_, d, p, t) =>
          var j = 0
          while (j < rem.length && rem(j) < t) j += 1
          val off =
            if (j < rem.length) { val o = SeqTokens - rem(j); rem(j) -= t; o }
            else { rem += (SeqTokens - t); 0L }
          (bucket, d, p, t, j.toLong, off)
        }
      }
      .toDF("bucket", "doc_id", "piece", "tok", "local_bin", "seq_offset")
    // globally-unique sequence ids: ~√n bucket bin-counts through one
    // metadata-sized exclusive-prefix window, broadcast back
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = placed.groupBy("bucket")
      .agg((max("local_bin") + 1).as("nbins"))
      .withColumn("bin_excl", sum("nbins").over(wBucket) - col("nbins"))
      .select("bucket", "bin_excl")
    placed.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("piece"), col("tok").as("n_tok"),
        (col("bin_excl") + col("local_bin")).as("seq_id"), col("seq_offset"))
  }

  /** Shuffle-quality audit of the deterministic training order: the
    * adjacent same-source rate over [[qGlobalShuffle]]'s positions vs
    * the rate a uniform random order would give (Σ nₛ(nₛ−1)/n(n−1) —
    * the exact without-replacement adjacency probability). A ratio
    * near 1.0 certifies the hash order doesn't clump sources — the
    * badly-shuffled-corpus failure mode where a training run sees an
    * hour of one crawl dump at a time. Adjacency is computed by a
    * position self-join (pos ↔ pos+1) — one co-partitioned shuffle —
    * NEVER a corpus-wide single-partition window; the expected-rate
    * side is a source histogram, metadata-sized. */
  def qShuffleAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val pos = globalShuffleRanked(docs, hashPrefixLenFor(n))
      .join(docs.select("doc_id", "source"), "doc_id")
    val a = pos.select(col("position").as("p"), col("source").as("s_a"))
    val b = pos.select((col("position") - 1).as("p"), col("source").as("s_b"))
    val obs = a.join(b, "p")
      .agg(count(lit(1)).as("n_adj"),
        sum(when(col("s_a") === col("s_b"), 1L).otherwise(0L)).as("same_adj"))
    val exp = docs.groupBy("source").agg(count(lit(1)).as("ns"))
      .agg(sum(col("ns") * (col("ns") - 1)).cast("double").as("num"),
        sum("ns").as("nn"))
    obs.crossJoin(exp).select(
      col("nn").as("n_docs"), col("n_adj"), col("same_adj"),
      graft.functions.Text.roundPortable(
        col("same_adj").cast("double") / col("n_adj"), 6).as("observed_rate"),
      graft.functions.Text.roundPortable(
        col("num") / (col("nn") * (col("nn") - lit(1L))), 6).as("expected_rate"),
      graft.functions.Text.roundPortable(
        (col("same_adj").cast("double") / col("n_adj")) /
          (col("num") / (col("nn") * (col("nn") - lit(1L)))), 4).as("clump_ratio"))
  }
}
