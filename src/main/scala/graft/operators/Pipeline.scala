package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Text

/** The end-to-end training-data curation pipeline — the composition
  * the individual operators exist for: quality gate → exact dedup →
  * LSH near-dup removal → curated corpus with token budget. Each
  * stage is one of the independently oracle-verified operators; the
  * composition itself is also oracle-checked.
  *
  * Stage order IS the optimization: the quality gate and exact dedup
  * are pure projections/one-hash-shuffle, so they run first and the
  * expensive stage — shingle/minhash signatures + the LSH band join —
  * only ever sees the surviving documents. Restricting LSH to
  * survivors is exact, not an approximation: a pair is a candidate
  * iff the two docs share a band bucket and is verified pairwise, so
  * pairs among survivors are identical whether or not dropped docs
  * participated. The survivor set and its signatures are each
  * materialized once and reused (the signature table feeds the band
  * join twice and the verify join twice).
  *
  * Near-dup rule: for every verified pair (a < b) whose both sides
  * survived the earlier stages, drop b — deterministic, one pass, no
  * iterative connected components (cluster-canonical choice, when it
  * matters, is `Dedup.qDedupClusters`' distributed label
  * propagation over the same verified pairs).
  */
object Pipeline {

  private val QualityThreshold = 0.35

  /** The stage-1 heuristic score over `text` — the text_quality
    * formula (length saturation + lexical diversity + stopword
    * share), unrounded. r14: the shared
    * [[graft.functions.QualityScore]] kernel — this was a third
    * hand-spelled copy of the formula, interpreted per doc and paid
    * once per curation (twice in qReleaseAudit). */
  private def heuristicQuality: org.apache.spark.sql.Column =
    graft.functions.QualityScore(col("text"))

  /** Stages 1–3 over an arbitrary document pool: quality gate →
    * exact dedup → LSH near-dup removal. Returns the surviving docs
    * with text retained (downstream stages may shingle them again). */
  private def curatedSurvivors(docs: DataFrame): DataFrame = {
    // stage 1: quality gate (projection-only — no shuffle)
    val gated = docs
      .withColumn("quality", Text.roundPortable(heuristicQuality, 4))
      .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      .where(col("quality") >= QualityThreshold)

    dedupStages(gated)
  }

  /** Stages 2–3, shared by both corpus builds: exact dedup (canonical
    * = min doc_id per content hash) then LSH near-dup removal over
    * the exact survivors only. */
  private def dedupStages(gated: DataFrame): DataFrame = {
    val wExact = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val exact = gated.withColumn("rn", row_number().over(wExact))
      .where(col("rn") === 1).drop("rn")
      .cache()

    val sigs = Dedup.signaturesOf(exact.select("doc_id", "text")).cache()
    val drops = Dedup.lshVerifiedPairs(sigs)
      .select(col("doc_b").as("doc_id")).distinct()

    exact.join(drops, Seq("doc_id"), "left_anti")
  }

  def qTrainingPipeline(spark: SparkSession, dir: String): DataFrame =
    curatedSurvivors(Tables.documents(spark, dir))
      .select("doc_id", "lang", "n_tokens", "quality")
      .orderBy("doc_id")

  /** Per-source curation funnel — the governance view of the same
    * stages ("where did my corpus go"): for every source, how many
    * docs it contributed and how many survive the quality gate, the
    * exact dedup, and the LSH removal. One corpus pass: the quality
    * flag is a projection; the exact-canonical flag is a single
    * window (min doc_id among quality-passers per content hash — the
    * same canonical `dedupStages` picks, without filtering rows out
    * so the funnel can still count the dropped ones); only the LSH
    * drop set needs the band join, and it runs over exact survivors
    * exactly as the pipeline itself does. Counts are monotone by
    * construction (curated ⊆ exact ⊆ quality ⊆ docs). */
  def qCurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val flaggedAll = docs
      .withColumn("is_q",
        Text.roundPortable(heuristicQuality, 4) >= QualityThreshold)
      .withColumn("is_e", col("is_q") &&
        col("doc_id") === min(when(col("is_q"), col("doc_id")))
          .over(Window.partitionBy(md5(col("text")))))
    // cache only the flag projection — at 100 TB caching the corpus
    // WITH text is eviction churn for a frame read twice as counts;
    // the LSH stage below is the only text consumer and reads the
    // uncached filtered view (one extra flag pass, ~10× less storage)
    val flagged = flaggedAll.select("doc_id", "source", "is_q", "is_e")
      .cache()
    val drops = Dedup.lshVerifiedPairs(
        Dedup.signaturesOf(flaggedAll.where(col("is_e"))
          .select("doc_id", "text")))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("lsh_dropped", lit(true))
    flagged.join(drops, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           count(when(col("is_q"), 1)).as("n_quality"),
           count(when(col("is_e"), 1)).as("n_exact"),
           count(when(col("is_e") && col("lsh_dropped").isNull, 1))
             .as("n_curated"))
      .orderBy("source")
  }

  /** A survivor may share this many distinct eval 4-grams before it
    * is dropped as contaminated (chance collisions are common on the
    * fixture's 40-word vocabulary; real pipelines with 8–13-gram
    * widths set this to 1). */
  private val ContaminationMax = 2

  /** The FULL pre-training corpus build — every round-7 operator
    * family composed end to end, and the composition oracle-checked:
    *
    *   eval holdout → quality gate → exact dedup → LSH near-dup
    *   removal → benchmark decontamination → sequence packing.
    *
    * The eval slice (doc_id ≡ 0 mod 20) never enters the pool; the
    * survivors of stages 1–3 are then checked for 4-gram overlap
    * against the RAW eval slice (decontamination must see the
    * benchmark as-is, not its curated subset) and dropped when they
    * share more than [[ContaminationMax]] distinct shingles; what
    * remains is packed concat-and-chunk into 256-token training
    * sequences in doc_id order via the two-phase distributed prefix
    * sum. Stage order is still the optimization: projections and
    * one-hash-shuffle dedups run before the signature/band joins, and
    * decontamination — a broadcast join against a fixed-size eval
    * store — runs only over LSH survivors. The pack's bucket width
    * derives from the parquet footer row count of the FULL table
    * (sparser surviving ids just mean emptier buckets). */
  def qPretrainCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 20 === 0
    val survivors = curatedSurvivors(docs.where(!isEval)).cache()

    // stage 4: decontamination against the raw eval slice
    val evalSh = TextAnalysis.shingleSet(docs.where(isEval), 4)
      .select("sh").distinct()
    val contaminated = TextAnalysis.decontaminateAgainst(
        evalSh, TextAnalysis.shingleSet(survivors, 4))
      .where(col("n_shared") > ContaminationMax)
      .select("doc_id")
    val clean = survivors.join(contaminated, Seq("doc_id"), "left_anti")

    // stage 5: concat-and-chunk packing of the curated corpus
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    Packing.packTokens(
        clean.withColumn("n_bpe_tokens",
          TextAnalysis.bpeTokenCount(col("text"))),
        Packing.bucketWidthFor(n))
      .select("doc_id", "lang", "quality", "n_bpe_tokens",
              "seq_id", "seq_offset")
      .orderBy("doc_id")
  }

  /** The corpus build with the MODEL-SHAPED stages swapped in — what
    * the 100 TB run actually looks like once a trained filter and a
    * benchmark index exist:
    *
    *   eval holdout → CLASSIFIER gate ([[TextAnalysis.classifierProb]],
    *   hashed inference as a projection) → exact dedup → LSH removal
    *   → BLOOM-prefiltered decontamination (the index-scale form) →
    *   sequence packing.
    *
    * Stages 2–3 and 5 are byte-identical to [[qPretrainCorpus]]
    * ([[dedupStages]] / [[Packing.packTokens]]); what changes is the
    * gate (model score instead of heuristics — filtering happens on
    * the unrounded probability, exactly like the standalone
    * text_quality_classifier gate) and the decontamination plan shape
    * (map-side Bloom probe + exact verify — same rows by the
    * one-sided-filter argument, cheaper shuffle). One oracle checks
    * the whole composition; the Bloom stage shares the plain
    * decontamination SQL because its output is provably identical. */
  def qPretrainCorpusModel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = col("doc_id") % 20 === 0

    // stage 1: classifier gate — score inline, keep prob ≥ 0.5
    val prob = TextAnalysis.classifierProb
    val gated = docs.where(!isEval)
      .where(size(Text.tokens(col("text"))) > 0 && prob >= 0.5)
      .withColumn("quality", Text.roundPortable(prob, 4))

    // stages 2–3: shared dedup
    val survivors = dedupStages(gated).cache()

    // stage 4: Bloom-prefiltered decontamination vs the RAW eval slice
    val evalSh = TextAnalysis.shingleSet(docs.where(isEval), 4)
      .select("sh").distinct()
    val contaminated = TextAnalysis.decontaminateBloomAgainst(
        evalSh, TextAnalysis.shingleSet(survivors, 4))
      .where(col("n_shared") > ContaminationMax)
      .select("doc_id")
    val clean = survivors.join(contaminated, Seq("doc_id"), "left_anti")

    // stage 5: packing, bucket width from the full-table footer count
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    Packing.packTokens(
        clean.withColumn("n_bpe_tokens",
          TextAnalysis.bpeTokenCount(col("text"))),
        Packing.bucketWidthFor(n))
      .select("doc_id", "lang", "quality", "n_bpe_tokens",
              "seq_id", "seq_offset")
      .orderBy("doc_id")
  }

  /** Epoch-aware training-order assembly — the step between "which
    * data" and "which batch" that multi-epoch mixing needs: the
    * epoch-weighted resample ([[Mixing.epochCopies]] — repetition AND
    * subsampling under one quota rule) feeds a per-COPY deterministic
    * shuffle (rank on md5(doc_id || '#' || epoch), so the same doc's
    * epochs scatter through the training order instead of clumping),
    * and the shuffled stream is concat-and-chunk packed into
    * 256-token sequences.
    *
    * Scale shape, stage by stage: the resample is map-only after its
    * 20-row quota broadcast; the shuffle-order prefix sum is the
    * hash-prefix two-phase trick — the hash bucket is a PREFIX of the
    * sort key, so per-bucket cumsums + broadcast bucket offsets equal
    * the global running sum at any prefix length. The length follows
    * [[Packing.hashPrefixLenFor]] of the RESAMPLE TARGET (the quota
    * rule realizes ~EpochTargetDocs copies total, whatever the raw
    * corpus size — the windowed set is the resampled stream, not the
    * corpus), so both window phases stay ~√(copies) per task. Token
    * counts ride in from n_chars (the precomputed-count hook): the
    * pipeline never re-tokenizes. */
  def qEpochPack(spark: SparkSession, dir: String): DataFrame = {
    val prefixLen = Packing.hashPrefixLenFor(Mixing.EpochTargetDocs)
    val ranked = Mixing.epochCopies(Tables.documents(spark, dir))
      .withColumn("rk", md5(concat(col("doc_id").cast("string"),
        lit("#"), col("epoch").cast("string"))))
      .withColumn("hb", substring(col("rk"), 1, prefixLen))
    val wIntra = Window.partitionBy("hb").orderBy("rk", "doc_id", "epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBucket = Window.orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranked.groupBy("hb").agg(sum("n_chars").as("bt"))
      .withColumn("b_excl", sum("bt").over(wBucket) - col("bt"))
      .select("hb", "b_excl")
    ranked
      .withColumn("intra", sum("n_chars").over(wIntra) - col("n_chars"))
      .join(broadcast(offsets), "hb")
      .withColumn("start_offset", col("b_excl") + col("intra"))
      // integer DIV — double division loses exactness past 2^53
      .withColumn("seq_id", expr("start_offset DIV 256"))
      .withColumn("seq_offset", pmod(col("start_offset"), lit(256L)).cast("long"))
      .select(col("doc_id"), col("epoch"), col("n_chars").as("n_tok"),
              col("seq_id"), col("seq_offset"))
      .orderBy("doc_id", "epoch")
  }

  /** Max chunks per document the packing key encodes — the key is
    * doc_id·256 + chunk_id, so a doc may span at most 256 chunks
    * (32 + 255·24 ≈ 6.1k tokens at the shipped window/stride). A
    * longer doc needs a wider stride here; the oracle encodes the
    * same rule, so an overflow would hash-mismatch loudly rather
    * than corrupt silently. */
  private val ChunkKeyStride = 256L

  /** The CHUNK-level pretraining assembly — the round-11 operators
    * composed into the shape a context-window training run actually
    * consumes: content-hash TRAIN split (held-out buckets never seen:
    * [[Mixing.qHashSplit]]'s rule) → verbatim span REMOVAL within the
    * train corpus ([[Dedup.verbatimRewrite]] — owners keep, repeats
    * cut) → context-window chunking of the cleaned text
    * ([[TextAnalysis.chunkDocs]]) → two-phase prefix-sum packing of
    * the chunks ([[Packing.packFromCounts]]). Empty chunks (docs
    * fully consumed by dedup) are dropped — a zero-token training row
    * is padding, not data.
    *
    * Composition is frame-level: each stage consumes the previous
    * frame's columns, so the corpus is scanned once at the head; the
    * shuffles are the rewrite's window index, the chunk explode's
    * output (map-side), and the pack's two window phases — nothing
    * new is introduced by composing. The pack key is
    * doc_id·[[ChunkKeyStride]]+chunk_id, decomposed back in the
    * output, so packing order is (doc, chunk) order. */
  /** CORPUS VERSION DIFF — the audit every dataset release runs:
    * given two versions of a document collection, report which docs
    * were ADDED, REMOVED, or CHANGED (content-hash inequality under
    * the same id; unchanged docs are excluded — a release audit
    * reads the delta, not the corpus). One full-outer join on doc_id
    * over (id, md5) projections — the corpus is never moved, only
    * 16-byte fingerprints; at 100 TB this is the cheapest possible
    * two-version comparison.
    *
    * Composable over ANY two (doc_id, text) frames; the gate feeds
    * it two deterministic synthetic versions of the fixture (v1 =
    * current minus every doc_id%10==7 doc, plus an edited text for
    * %10==3, plus a retired id range) so all three statuses execute. */
  private[graft] def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.select(col("doc_id"), md5(col("text")).as("h1"))
      .join(v2.select(col("doc_id"), md5(col("text")).as("h2")),
        Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("unchanged"))
      .where(col("status") =!= "unchanged")
      .select("doc_id", "status")
      .orderBy("doc_id")

  def qCorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    // the synthetic PREVIOUS version: %10==7 docs absent (→ added in
    // v2), %10==3 docs carried an older text (→ changed), and a
    // retired 1e10-offset id range present only in v1 (→ removed) —
    // ONE rule shared with the drift gates ([[syntheticPreviousVersion]])
    corpusDiff(syntheticPreviousVersion(docs), docs)
  }

  /** CORPUS DRIFT — the population-stability index (PSI) between two
    * release versions' document-length distributions, the governance
    * twin of [[corpusDiff]]: diff answers "WHICH docs changed", drift
    * answers "did the SHAPE of the corpus move" (a release whose
    * diff is large but whose PSI is ~0 swapped content in place; a
    * small diff with a big PSI quietly changed the length mix — the
    * thing that silently shifts a token-budget mix or pack density
    * downstream). PSI = Σ (p₂−p₁)·ln(p₂/p₁) over fixed length
    * buckets, reported per bucket; buckets are FIXED-EDGE (100-char
    * steps capped at bucket 9) so two engines — and two releases —
    * always histogram identically, and shares are Laplace-smoothed
    * ((c+1)/(n+B)) so an empty bucket on one side stays finite.
    *
    * Scale shape: one map-only projection + a B-bucket partial agg
    * per version — the cheapest two-pass comparison after the
    * fingerprint diff; the PSI math runs on the B-row bucket table
    * (metadata-scale, one partition by design). */
  private[graft] val DriftBuckets = 10

  /** The fixed-edge length histogram both drift surfaces share:
    * counts per 100-char bucket capped at [[DriftBuckets]]−1. Counts
    * are ADDITIVE, so per-batch histograms merge exactly — what makes
    * the streaming monitor equal the one-shot computation. */
  private[graft] def driftHist(v: DataFrame, cName: String): DataFrame = v
    .select(least(floor(length(col("text")) / lit(100.0)),
      lit((DriftBuckets - 1).toDouble)).cast("long").as("bucket"))
    .groupBy("bucket").agg(count(lit(1)).as(cName))

  private[graft] def corpusDrift(v1: DataFrame, v2: DataFrame): DataFrame =
    driftFromHists(v1.sparkSession,
      driftHist(v1, "c1"), driftHist(v2, "c2"))

  /** PSI tail over two prepared bucket histograms. */
  private[graft] def driftFromHists(spark: SparkSession,
      h1: DataFrame, h2: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = DriftBuckets
    val grid = spark.range(0, B).select(col("id").as("bucket"))
    val all = Window.partitionBy() // B-row bucket table: metadata-scale
    val joined = grid
      .join(h1, Seq("bucket"), "left")
      .join(h2, Seq("bucket"), "left")
      .na.fill(0L, Seq("c1", "c2"))
      .withColumn("p1", (col("c1") + 1) / (sum("c1").over(all) + B))
      .withColumn("p2", (col("c2") + 1) / (sum("c2").over(all) + B))
    joined.select(col("bucket"), col("c1"), col("c2"),
        graft.functions.Text.roundPortable(col("p1"), 6).as("p1"),
        graft.functions.Text.roundPortable(col("p2"), 6).as("p2"),
        graft.functions.Text.roundPortable(
          (col("p2") - col("p1")) * log(col("p2") / col("p1")), 6)
          .as("psi_term"))
      .orderBy("bucket")
  }

  /** The synthetic PREVIOUS release both drift gates (and their
    * streaming twin) compare against — the [[qCorpusDiff]] versioning
    * rule, factored so every governance gate derives one v1. */
  private[graft] def syntheticPreviousVersion(docs: DataFrame): DataFrame =
    docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 3,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      .unionByName(
        docs.where(pmod(col("doc_id"), lit(10)) === 4)
          .select((col("doc_id") + 10000000000L).as("doc_id"), col("text")))

  /** The gate composes [[corpusDrift]] over the SAME synthetic
    * previous release [[qCorpusDiff]] builds, so the two governance
    * views are gated against one versioning rule. */
  def qCorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    corpusDrift(syntheticPreviousVersion(docs), docs)
  }

  /** Sequences per training shard in the release audit — sized so
    * the sf fixtures yield a handful of shards (enough to exercise
    * boundary-spanning sequences) while the per-shard manifest stays
    * the bounded driver collect [[graft.sources.ShardWriter]]
    * documents. */
  private val ReleaseSeqsPerShard = 32L

  /** The END-TO-END DATASET RELEASE — every governance artifact of a
    * corpus version shipped, composed and gated as one audit:
    *
    *   curate (quality → exact dedup → LSH removal) → pack
    *   (two-phase prefix sum) → writeShards (REAL parquet export +
    *   read-back manifest) → corpusDiff vs the PREVIOUS release's
    *   curated corpus → per-source datasheet of the released docs.
    *
    * Output is one uniform long-format frame (entry, k, n):
    *   - total docs/seqs/tokens — summed from the read-back manifest,
    *     so the gate verifies what is ON DISK against the oracle's
    *     from-logic recompute (verify-after-write, oracle-checked);
    *   - per-shard docs/seqs/tokens — ditto, shard = seq_id DIV
    *     [[ReleaseSeqsPerShard]] (content_hash stays out of the gate:
    *     xxhash64 has no DuckDB twin; ShardWriterSpec pins it);
    *   - diff status counts between the two CURATED releases — the
    *     audit a release manager actually reads ("what changed in
    *     what we SHIP", not in the raw pool);
    *   - per-source released docs/tokens — the datasheet counts.
    *
    * The previous release's raw pool is the [[qCorpusDiff]] synthetic
    * rule (%10==7 absent → added, %10==3 older text → changed) except
    * the retired docs carry NOVEL deterministic text (id interleaved
    * into a stopword frame) instead of a copied one: a retired doc
    * with copied text would be exact/near-dup-removed by its own
    * curation and never reach the diff — novel text makes 'removed'
    * actually execute through the curated path.
    *
    * The export (pack + writeShards + manifest read-back) is memoized
    * per (session, corpus) via [[graft.core.ModelCache]] — re-running
    * the audit against an unchanged corpus must not re-export shards,
    * exactly like the model fits. Scale: both curations are the
    * gated pipeline shape (band join over survivors only); the diff
    * moves 16-byte fingerprints; the datasheet is one partial-agg
    * shuffle; the manifest collect is one row per shard. */
  def qReleaseAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)

    // the previous release's raw pool (see scaladoc for the rules)
    val idStr = (col("doc_id") + 10000000000L).cast("string")
    val retired = docs.where(pmod(col("doc_id"), lit(10)) === 4)
      .select((col("doc_id") + 10000000000L).as("doc_id"),
        col("source"), col("lang"),
        concat_ws(" ", lit("the"), idStr, lit("and"), idStr, lit("of"),
          idStr, lit("to"), idStr, lit("a"), idStr).as("text"))
    val v1pool = docs
      .select("doc_id", "source", "lang", "text")
      .where(pmod(col("doc_id"), lit(10)) =!= 7)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 3,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      .unionByName(retired.select("doc_id", "source", "lang", "text"))

    // both releases curated by the SAME pipeline the corpus gate runs
    val rel2 = curatedSurvivors(docs)
      .select("doc_id", "source", "text").cache()
    val rel1 = curatedSurvivors(v1pool).select("doc_id", "text")

    val diffRows = corpusDiff(rel1, rel2.select("doc_id", "text"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .select(lit("diff").as("entry"), col("status").as("k"), col("n"))

    val withTok = rel2.withColumn("n_bpe_tokens",
      TextAnalysis.bpeTokenCount(col("text")))
    val srcAgg = withTok.groupBy("source")
      .agg(count(lit(1)).as("nd"), sum("n_bpe_tokens").cast("long").as("nt"))
    val srcRows = srcAgg
      .select(lit("release_docs").as("entry"), col("source").as("k"),
        col("nd").as("n"))
      .unionByName(srcAgg.select(lit("release_tokens").as("entry"),
        col("source").as("k"), col("nt").as("n")))

    // pack + REAL shard export + read-back manifest, build-once
    val m = graft.core.ModelCache.corpusModel(spark,
      s"release_manifest:$ReleaseSeqsPerShard",
      s"$dir/documents.parquet") {
      val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
      val packed = Packing.packTokens(
          withTok.select("doc_id", "n_bpe_tokens"),
          Packing.bucketWidthFor(n))
        .select("doc_id", "n_bpe_tokens", "seq_id", "seq_offset")
      val out = java.nio.file.Files
        .createTempDirectory("graft_release").toString
      graft.sources.ShardWriter.writeShards(
        packed, out, ReleaseSeqsPerShard)
    }
    val manifestRows = (
      Seq(("total", "docs", m.totalDocs),
          ("total", "seqs", m.totalSeqs),
          ("total", "tokens", m.totalTokens)) ++
      m.shards.flatMap(s => Seq(
        ("shard_docs", s.shardId.toString, s.nDocs),
        ("shard_seqs", s.shardId.toString, s.nSeqs),
        ("shard_tokens", s.shardId.toString, s.nTokens)))
    ).toDF("entry", "k", "n")

    manifestRows.unionByName(diffRows).unionByName(srcRows)
      .orderBy("entry", "k")
  }

  def qChunkedPretrain(spark: SparkSession, dir: String): DataFrame = {
    val nDocs = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val train = Tables.documents(spark, dir)
      .where(Mixing.hashBucket(col("text")) < 90)
    val clean = Dedup.verbatimRewrite(train)
      .select(col("doc_id"), col("clean_text").as("text"))
    val chunks = TextAnalysis.chunkDocs(clean)
      .where(col("n_chunk_tokens") > 0)
      .select((col("doc_id") * ChunkKeyStride + col("chunk_id")).as("pack_key"),
              col("n_chunk_tokens"))
    val packed = Packing.packFromCounts(
      chunks.select(col("pack_key").as("doc_id"), col("n_chunk_tokens")),
      "n_chunk_tokens", nDocs)
    packed
      .select(expr(s"doc_id DIV $ChunkKeyStride").as("doc_id"),
              pmod(col("doc_id"), lit(ChunkKeyStride)).cast("long").as("chunk_id"),
              col("n_bpe_tokens").as("n_chunk_tokens"),
              col("seq_id"), col("seq_offset"))
      .orderBy("doc_id", "chunk_id")
  }

  /** The round-13 curation composition, end to end: DSIR importance
    * gate → per-domain cap → packing arithmetic, reported as ONE
    * audit row (the datasheet convention). Keeps docs the target LM
    * prefers (rounded log_weight > 0 — the sign both engines agree
    * on by the dsir gate), caps each source at its 5 best survivors
    * through the bounded-heap [[graft.plans.GroupedTopK]], then
    * derives the packed-stream shape from the survivor token total —
    * exact for concat-and-chunk, where sequence count and final fill
    * are functions of the total alone (the per-doc assignment is
    * pack_sequences' own gate).
    *
    * Scale shape: the DSIR gate is map-only against driver LMs; the
    * join-back is doc_id-keyed; the cap holds ≤5 rows per source per
    * task; the report is three one-row aggregates cross-joined.
    * Every stage is itself an oracle-gated operator — this gates the
    * COMPOSITION. */
  def qCurationAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (tgt, raw) = TextAnalysis.dsirModelsFor(spark, dir)
    val kept = docs.join(
      TextAnalysis.dsirScore(docs, tgt, raw)
        .where(col("log_weight") > 0).select("doc_id"),
      "doc_id")
    val capped = graft.plans.GroupedTopKApi.groupedTopKOrdered(
      kept.select("doc_id", "source", "n_chars", "text"),
      keys = Seq("source"),
      sort = Seq("n_chars" -> false, "doc_id" -> true),
      k = 5)
    val SeqTokens = 256L
    val stats = capped
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .agg(count(lit(1)).as("n_capped"),
           coalesce(sum("n"), lit(0L)).as("total_tokens"))
    docs.agg(count(lit(1)).as("n_input"))
      .crossJoin(kept.agg(count(lit(1)).as("n_dsir_kept")))
      .crossJoin(stats)
      .select(col("n_input"), col("n_dsir_kept"), col("n_capped"),
        col("total_tokens"),
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(expr(s"(total_tokens - 1) DIV $SeqTokens") + 1)
          .as("n_seqs"),
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(((col("total_tokens") - 1) % SeqTokens) + 1)
          .as("last_fill"))
  }

  /** END-TO-END RLHF DATA AUDIT — the eval family's composition gate
    * (the r13 verdict's stretch): the chain a preference-data build
    * runs, each stage an independently-gated operator, hash-checked
    * as one row. Rater frame → majority labels
    * ([[EvalScoring.qEvalMajorityVote]]'s synthetic 3-rater panel) →
    * CLEAN prompts (majority label uncorrupted — the annotation-QA
    * gate a real pipeline applies before building pairs) →
    * preference pairs over clean prompts only
    * ([[EvalScoring.qPreferencePairs]]) → source-level duels (the
    * chosen doc's source beats the rejected's — the arena reduction)
    * → Bradley–Terry strengths → one audit row: panel size, clean
    * share, pair count, exact decimal mean margin, ranked-source
    * count, and the top source with its fitted strength.
    *
    * Scale shape: every stage keeps its own gated plan (panel-sized
    * windows, one duel partial-agg shuffle, k²-bounded driver fit);
    * the composition adds two broadcast-sized joins (clean-prompt
    * semi-join, source lookups) and three one-row aggregates. */
  def qRlhfAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // both stage outputs feed TWO consumers each (the count aggregates
    // and the next stage) and are panel-sized — localCheckpoint so the
    // F1 reward kernel and the vote windows run once, not per consumer
    val maj = EvalScoring.qEvalMajorityVote(spark, dir).localCheckpoint()
    val clean = maj.where(col("maj_label") =!= "zz")
      .select(col("item_id").as("prompt_id"))
    val pairs = EvalScoring.qPreferencePairs(spark, dir)
      .join(clean, "prompt_id")
      .localCheckpoint()
    val src = docs.select("doc_id", "source")
    val duels = pairs
      .join(src.select(col("doc_id").as("chosen_id"),
        col("source").as("ws")), "chosen_id")
      .join(src.select(col("doc_id").as("rejected_id"),
        col("source").as("ls")), "rejected_id")
      .where(col("ws") =!= col("ls"))
      .select(col("ws").as("winner"), col("ls").as("loser"))
    // ONE fit: the duel aggregation collects once; the returned frame
    // is driver-built model state, free to reuse
    val bt = EvalScoring.bradleyTerryFit(duels)
    val top = bt.where(col("rank") === 1)
      .select(col("source").as("top_source"),
        col("strength").as("top_strength"))
    val nRanked = bt.agg(count(lit(1)).as("n_ranked"))
    maj.agg(count(lit(1)).as("n_items"),
        coalesce(sum(when(col("maj_label") =!= "zz", 1L).otherwise(0L)),
          lit(0L)).as("n_clean"))
      .crossJoin(pairs.agg(
        count(lit(1)).as("n_pairs"),
        // margins are 4dp-rounded: a DECIMAL sum is exact and
        // order-independent, then ONE correctly-rounded division
        coalesce(sum(col("margin").cast("decimal(20,4)")), lit(0))
          .cast("double").as("margin_sum")))
      .crossJoin(nRanked)
      .crossJoin(top)
      .select(col("n_items"), col("n_clean"), col("n_pairs"),
        when(col("n_pairs") === 0, lit(0.0)).otherwise(
          Text.roundPortable(col("margin_sum") / col("n_pairs"), 4))
          .as("mean_margin"),
        col("n_ranked"), col("top_source"), col("top_strength"))
  }
}
