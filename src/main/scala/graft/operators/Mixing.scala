package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temperature-weighted corpus mixing — the data-mixing step of an
  * LLM pre-training pipeline: resample the corpus so each stratum's
  * share follows count^α (α < 1 flattens the natural distribution,
  * upweighting rare strata — the multilingual-sampling trick) instead
  * of its raw share. Strata here are the `lang` column, whose counts
  * are genuinely skewed in the fixture (en ≈ 2.4× de).
  *
  * Mechanics are [[ParamFilters.qStratifiedSample]]'s, with computed
  * rather than proportional quotas: weight = √count per stratum,
  * largest-remainder rounding so quotas sum exactly to the target,
  * and a deterministic md5 rank standing in for the random draw (so
  * the oracle can replay the selection). The quota table is one row
  * per stratum — per-stratum aggregates and its windows are trivially
  * bounded, and it broadcasts back onto the corpus. The corpus side
  * is first pruned to each stratum's TargetN first-ranked docs by the
  * bounded-heap [[graft.plans.GroupedTopK]] operator, so no stratum
  * is ever fully sorted (quotas never exceed TargetN): the same
  * 100 TB posture as the stratified sampler.
  *
  * A stratum with fewer docs than its quota yields everything it has
  * (the rn ≤ quota join can't invent rows), so the output can fall
  * short of TargetN on degenerate corpora — under-filling honestly
  * rather than silently reweighting the other strata.
  */
object Mixing {

  private val TargetN = 200
  // α = 0.5 (weight = count^α = √count), scaled to integer MILLIONTHS:
  // sqrt/×/+/floor are all correctly-rounded IEEE ops, so the scaled
  // weight is bit-identical in both engines — and the weight SUM is
  // then a sum of longs, which no engine, partitioning, or evaluation
  // order can perturb. (An unordered double sum here was a latent
  // last-bit flake: near-tied remainders could flip a largest-
  // remainder rank between engines.) Headroom: √mass ≤ 1e6 even at a
  // 10¹² mass, so w ≤ 1e12 and stratum-count × 1e12 stays well under
  // 2^53 — the division's operands are exactly representable.
  private def weight(mass: Column): Column =
    floor(sqrt(mass.cast("double")) * lit(1e6) + lit(0.5))

  def qTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("lang"))
    val quotas = docs.groupBy("lang").agg(count(lit(1)).as("g_cnt"))
      .withColumn("w", weight(col("g_cnt")))
      .withColumn("ideal", lit(TargetN) * col("w").cast("double") /
        sum("w").over(wAll).cast("double"))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(TargetN) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
      .select("lang", "quota")
    val ranked = docs.select(col("lang"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("rk"))
    val pruned = graft.plans.GroupedTopKApi.groupedTopKOrdered(ranked,
      keys = Seq("lang"),
      sort = Seq("rk" -> true, "doc_id" -> true),
      k = TargetN)
    val wRank = Window.partitionBy("lang").orderBy(col("rk"), col("doc_id"))
    pruned
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .join(broadcast(quotas), "lang")
      .where(col("rn") <= col("quota"))
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id")
  }

  private val TokenBudget = 20000L

  // sized between the fixtures' min source and total token mass so
  // the gate exercises BOTH regimes (small sources ride free, large
  // ones share the cap)
  private[graft] val WaterfillBudget = 26000L

  /** WATERFILLING BUDGET ALLOCATION — the anti-over-representation
    * mixing rule: split a global token budget across sources by
    * CAPPING the largest ones at a common level c and letting every
    * smaller source keep all its tokens — alloc_s = min(n_s, c) with
    * c chosen so Σ alloc = budget. Temperature/√-mass mixing
    * (qTokenBudgetMix) reshapes ALL sources; waterfilling is the
    * rule for "nothing may dominate, the tail rides free" (the
    * per-domain cap practice in crawl curation). Integer-exact: the
    * capped sources share the residual budget evenly, floor'd, with
    * the remainder distributed +1 to the lexicographically-first
    * capped sources — so Σ alloc = budget EXACTLY when the corpus
    * exceeds it, alloc = n_s everywhere otherwise.
    *
    * The closed form needs no driver solve: sort sources by n_s
    * ascending; a source is uncapped iff its prefix sum plus n_s ×
    * (sources remaining) fits the budget — that predicate is
    * MONOTONE along the sort (difference telescopes to
    * (S−i)(n_{i+1}−n_i) ≥ 0), so the uncapped set is a prefix and
    * one pass of window functions finds the cap level and residue.
    * Scale shape: ONE partial-agg shuffle builds the source
    * histogram; everything after runs on the metadata-sized source
    * table (the single-partition windows see sources-many rows —
    * the GroupedTopK-subtotal situation, never corpus rows). */
  def qBudgetWaterfill(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.Text.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("n_tok"))
    waterfill(counts, WaterfillBudget)
  }

  /** Core over a prepared (source, n_tok) histogram — metadata-sized
    * by contract (one row per source). */
  private[graft] def waterfill(counts: DataFrame, budget: Long): DataFrame = {
    val byAsc = Window.partitionBy().orderBy(col("n_tok"), col("source"))
    val wCum = byAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    counts
      .withColumn("cum", sum("n_tok").over(wCum))
      .withColumn("i", row_number().over(byAsc).cast("long"))
      .withColumn("s_all", count(lit(1)).over(wAll))
      .withColumn("uncapped",
        col("cum") + col("n_tok") * (col("s_all") - col("i")) <= budget)
      .withColumn("k_tok",
        sum(when(col("uncapped"), col("n_tok")).otherwise(0L)).over(wAll))
      .withColumn("n_capped",
        sum(when(col("uncapped"), 0L).otherwise(1L)).over(wAll))
      .withColumn("cap_base",
        when(col("n_capped") > 0,
          floor((lit(budget) - col("k_tok")) / col("n_capped")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("cap_rem",
        lit(budget) - col("k_tok") - col("cap_base") * col("n_capped"))
      .withColumn("rc",
        row_number().over(Window.partitionBy("uncapped").orderBy("source"))
          .cast("long"))
      .select(col("source"), col("n_tok"),
        when(col("uncapped"), col("n_tok"))
          .otherwise(col("cap_base") +
            when(col("rc") <= col("cap_rem"), 1L).otherwise(0L))
          .as("alloc"),
        (!col("uncapped")).as("capped"))
      .orderBy("source")
  }

  /** Token-budget mixing — [[qTemperatureMix]]'s sibling that budgets
    * what training actually consumes: allocate a global TOKEN budget
    * across sources ∝ √(source token mass) (largest-remainder in
    * whole tokens: each floor loses under one token, so the leftover
    * is below the source count and the +1 redistribution applies
    * unchanged), then fill each source's quota greedily in the same
    * deterministic md5 order — a document is selected iff the running
    * token sum through it still fits the quota, so Σ selected tokens
    * ≤ quota per source and ≤ budget overall, exactly.
    *
    * Scale posture mirrors the other quota samplers: the quota table
    * is one row per source (broadcast back), and the per-source
    * prefix scan is bounded BEFORE the window by a [[graft.plans.GroupedTopK]]
    * prune to budget-many docs (zero-token docs are dropped up front,
    * so a quota of B tokens can consume at most B surviving docs) —
    * no source is ever fully sorted. The running sum itself is the
    * TWO-PHASE prefix sum ([[Packing.packTokens]]'s shape): the md5
    * rank's first [[Packing.hashPrefixLenFor]] hex chars split each
    * source into ~√(windowed-set) uniform sub-buckets that are a
    * PREFIX of the (rk, doc_id) sort key, the heavy cumulative window
    * runs per (source, sub-bucket), and only the per-source sub-bucket
    * subtotals see a wider window — so no single task ever scans a
    * whole source's quota, even when the budget (and thus the
    * GroupedTopK bound) is production-sized. */
  def qTokenBudgetMix(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetMixFromCounts(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_tok")),
      totalDocs = Tables.parquetRowCount(spark, s"$dir/documents.parquet"))

  private[operators] val EpochTargetDocs = 600L
  // 16^6 — the md5-prefix hash space of [[hash24]]; the integer
  // cross-multiplied threshold compare below needs it as a literal
  private val Hash24Space = 16777216L

  /** First 6 hex chars of md5(doc_id) as a long in [0, 2^24) — the
    * proven cross-engine uniform hash (DuckDB reads it back as
    * CAST(('0x'||substr(md5(..),1,6)) AS BIGINT)). */
  private def hash24(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long")

  /** QUALITY-WEIGHTED importance sampling — the probabilistic
    * quality gate between a hard threshold filter (keep/drop at a
    * cut) and no filter at all (the DCLM-style recipe: keep each
    * document with probability equal to its quality score, so
    * mid-quality text thins out rather than vanishing, and corpus
    * diversity survives the cleanup). The "draw" is the proven
    * cross-engine [[hash24]] uniform; a doc is kept iff
    * hash24(doc_id) < floor(score · 2²⁴) — an INTEGER threshold on
    * the 4-decimal-rounded score, so the keep decision compares
    * exactly in both engines (no float-boundary flakiness). Kept
    * rows carry the Horvitz-Thompson weight 1/score so downstream
    * statistics stay unbiased.
    *
    * Scale shape: one MAP-ONLY projection + filter over the corpus —
    * no shuffle, no model state; the score is
    * [[TextAnalysis.qualityScoreCol]], shared with the text_quality
    * gate so there is exactly one score definition. */
  def qQualitySample(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.qualityScoreCol.as("quality_score"),
        hash24(col("doc_id")).as("h"))
      .where(col("h") <
        floor(col("quality_score") * lit(Hash24Space.toDouble)).cast("long"))
      .select(col("doc_id"), col("quality_score"),
        graft.functions.Text.roundPortable(
          lit(1.0) / col("quality_score"), 4).as("weight"))
      .orderBy("doc_id")

  /** Epoch-weighted resampling WITH REPETITION — the "repeat rare
    * sources for multiple epochs" step of pre-training data mixing
    * (the up-sampling half that [[qTemperatureMix]], a pure sampler,
    * cannot express). Each source's document quota is allocated
    * ∝ √(character mass) with largest-remainder rounding (the
    * integer-scaled [[weight]] contract), and a quota is realized as
    * copies-per-document: every doc gets ⌊quota/n⌋ full epochs, and
    * docs whose 24-bit md5 hash falls below (quota mod n)/n of the
    * hash space get one more — so a quota BELOW the source count
    * degrades to hash-proportional subsampling and a quota above it
    * to fractional epochs, under one definition.
    *
    * The fractional-epoch membership test is the exact integer
    * compare h·n < r·2^24 (h < 2^24, so it stays in long range for
    * any source under ~5×10¹¹ docs) — no rank, no sort, no float.
    * That is the 100 TB posture: after the one tiny quota aggregate
    * (one row per source, broadcast back), the corpus side is
    * MAP-ONLY — hash, compare, explode a ≤(base+1)-element sequence.
    * Selecting exactly r extra docs would need a per-source rank of
    * the whole corpus; proportional-in-expectation hashing is the
    * standard trade and the oracle replays it bit-for-bit. */
  def qMixEpochs(spark: SparkSession, dir: String): DataFrame =
    epochCopies(Tables.documents(spark, dir))
      .select("source", "doc_id", "epoch")
      .orderBy("source", "doc_id", "epoch")

  /** The epoch-resample core, presentation-free: (source, doc_id,
    * n_chars, epoch) rows — n_chars rides through so the epoch-pack
    * pipeline can budget tokens without re-joining the corpus. */
  private[operators] def epochCopies(docs: DataFrame): DataFrame = {
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("source"))
    val quotas = docs.groupBy("source")
      .agg(sum("n_chars").as("mass"), count(lit(1)).as("n_docs"))
      .withColumn("w", weight(col("mass")))
      .withColumn("ideal", lit(EpochTargetDocs) * col("w").cast("double") /
        sum("w").over(wAll).cast("double"))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(EpochTargetDocs) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        (col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .cast("long"))
      .select(col("source"), col("quota"), col("n_docs"))
    realizeQuotas(docs, quotas)
  }

  /** Quota realization over an EXTERNAL (source, quota) table — where
    * [[domainReweightWith]]'s DoReMi quotas (or any per-source quota
    * policy) plug into the [[epochCopies]] resampler; per-source doc
    * counts are one metadata-sized partial agg. */
  private[graft] def resampleByQuotas(docs: DataFrame,
                                      quotaTable: DataFrame): DataFrame =
    realizeQuotas(docs,
      docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(quotaTable.select("source", "quota"), "source"))

  /** The realization core shared by both quota sources: every doc
    * gets ⌊quota/n⌋ full epochs plus one more iff its 24-bit hash
    * falls under the fractional remainder — the exact integer
    * compare, no rank, no float; broadcast quota join + MAP-ONLY
    * corpus side. */
  private def realizeQuotas(docs: DataFrame,
                            quotas: DataFrame): DataFrame = {
    docs.select("source", "doc_id", "n_chars")
      .join(broadcast(quotas), "source")
      .withColumn("copies",
        // integral DIV, matching the oracle's `//`: `/` is double
        // division, exact only while quotients stay far from an
        // integer-crossing rounding error — a raised EpochTargetDocs
        // could silently diverge
        expr("quota DIV n_docs") +
        when(hash24(col("doc_id")) * col("n_docs") <
             (col("quota") % col("n_docs")) * lit(Hash24Space), 1L)
          .otherwise(0L))
      // copies = 0 drops the doc (subsampling); the filter must come
      // BEFORE sequence(): Spark's sequence(1, 0) counts DOWN
      .where(col("copies") >= 1L)
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(sequence(lit(1L), col("copies"))).as("epoch"))
  }

  /** The REAL-TOKENIZER hook ([[Packing.packFromCounts]]'s twin):
    * budget-mix from a caller-supplied (doc_id, source, n_tok) frame —
    * a production pipeline tokenizes once and materializes counts as
    * a column, so the mixer takes counts as data rather than
    * recomputing the regex stand-in. `totalDocs` (parquet footer
    * count at the gate) sizes the internal hash-bucket fan-out: the
    * windowed set per source is ≤ min(totalDocs, budget) after the
    * GroupedTopK prune, so the prefix length follows that bound —
    * omitted, the budget alone sizes it. */
  def tokenBudgetMixFromCounts(counted: DataFrame,
                               totalDocs: Long = Long.MaxValue): DataFrame = {
    val prefixLen =
      Packing.hashPrefixLenFor(math.min(totalDocs, TokenBudget))
    val docs = counted
      // zero-token docs can't consume budget, but they'd pass the
      // ≤-quota filter forever — and they'd make the docs-per-quota
      // prune bound vacuous. Dropped here AND in the oracle.
      .where(col("n_tok") > 0)
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("source"))
    val quotas = docs.groupBy("source").agg(sum("n_tok").as("g_tok"))
      .withColumn("w", weight(col("g_tok")))
      .withColumn("ideal", lit(TokenBudget) * col("w").cast("double") /
        sum("w").over(wAll).cast("double"))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(TokenBudget) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .withColumn("quota",
        col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
      .select("source", "quota")
    val ranked = docs.withColumn("rk", md5(col("doc_id").cast("string")))
    val pruned = graft.plans.GroupedTopKApi.groupedTopKOrdered(ranked,
      keys = Seq("source"),
      sort = Seq("rk" -> true, "doc_id" -> true),
      k = TokenBudget.toInt)
      .withColumn("hb", substring(col("rk"), 1, prefixLen))
    // phase 1: per-(source, hash-bucket) inclusive running sum —
    // parallel across the 16^prefixLen sub-buckets per source
    val wIntra = Window.partitionBy("source", "hb").orderBy("rk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase 2: exclusive prefix over each source's ≤16^prefixLen
    // sub-bucket subtotals, broadcast back. hb is a prefix of rk, so
    // (hb, rk, doc_id) order IS (rk, doc_id) order and
    // bucket-prefix + intra-bucket sum equals the per-source cumsum
    // at ANY prefix length — the fan-out is internal.
    val wBucket = Window.partitionBy("source").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = pruned.groupBy("source", "hb").agg(sum("n_tok").as("bt"))
      .withColumn("b_excl", sum("bt").over(wBucket) - col("bt"))
      .select("source", "hb", "b_excl")
    pruned
      .withColumn("cum_intra", sum("n_tok").over(wIntra))
      .join(broadcast(offsets), Seq("source", "hb"))
      .join(broadcast(quotas), "source")
      .where(col("b_excl") + col("cum_intra") <= col("quota"))
      .select(col("source"), col("doc_id"), col("n_tok").as("n_bpe_tokens"))
      .orderBy("source", "doc_id")
  }

  // train/val/test boundaries over the 100 content-hash buckets
  private val ValBucket = 90  // buckets 0-89 train (90 %)
  private val TestBucket = 95 // 90-94 val, 95-99 test (5 % each)

  /** Deterministic content-hash train/val/test split — the
    * reproducible-held-out-set primitive every training pipeline
    * needs: membership is a pure function of the document TEXT
    * (bucket = first 24 bits of md5(text) mod 100), so the same doc
    * lands in the same split across re-shards, re-ingests, engine
    * versions, and cluster sizes — properties a `rand()`-based or
    * row-number-based split all lack. Content (not doc_id) keying
    * also means exact duplicates land in the SAME split, so a dup
    * surviving upstream dedup can never straddle the train/test
    * boundary and leak.
    *
    * Scale shape: a pure per-row projection — ZERO shuffles, no
    * model state, no driver participation; the one plan in this
    * library that is trivially 100 TB-safe by construction. Spark
    * evaluates the bucket via codegen'd md5+conv; the oracle mirrors
    * it as DuckDB's hex cast (('0x' || substr(md5(text),1,6))::BIGINT)
    * — same 24-bit integer, engine-independently. */
  /** The content-hash bucket (0-99) of a text column — the one
    * definition [[qHashSplit]] and every pipeline split filter share
    * (two spellings of the hash would silently disagree on membership). */
  private[graft] def hashBucket(text: Column): Column =
    conv(substring(md5(text), 1, 6), 16, 10).cast("long") % 100

  def qHashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", hashBucket(col("text")))
      .withColumn("split",
        when(col("bucket") < ValBucket, "train")
          .when(col("bucket") < TestBucket, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  // Per-domain document cap — 5 keeps every fixture source
  // over-subscribed (each has ~15-30 docs) so the cap genuinely cuts;
  // the production dial is ~10⁵ per registrable domain
  private val DomainCap = 5

  /** PER-DOMAIN CAPPING — the domain-balancing guard of web-corpus
    * curation (C4/RefinedWeb keep at most N pages per domain so no
    * single site dominates training): keep the [[DomainCap]]
    * highest-value docs per `source`, value = (longest text first,
    * doc_id tiebreak) as the stand-in for a quality model score.
    *
    * Scale shape: the selection is the bounded-heap
    * [[graft.plans.GroupedTopK]] physical operator — each task holds
    * ≤cap rows per domain (partial mode), the one shuffle carries
    * ≤cap·partitions rows per domain, and no domain is ever fully
    * sorted: a 10⁹-page domain costs the same task memory as a
    * 10-page one, which is the whole point at web scale where domain
    * cardinality is ~10⁷ and the head domain is ~10⁶ pages. The rank
    * column is a panel-sized window AFTER capping (≤cap rows per
    * domain). */
  def qDomainCap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "n_chars")
    val capped = graft.plans.GroupedTopKApi.groupedTopKOrdered(docs,
      keys = Seq("source"),
      sort = Seq("n_chars" -> false, "doc_id" -> true),
      k = DomainCap)
    capped
      .withColumn("rank", row_number().over(
        Window.partitionBy("source")
          .orderBy(desc("n_chars"), col("doc_id"))).cast("long"))
      .select("doc_id", "source", "n_chars", "rank")
      .orderBy("doc_id")
  }

  private val ReweightBudget = 1000L
  private val ReweightTemp = 0.5
  private val ReweightClip = 1.0

  /** DOREMI-STYLE DOMAIN REWEIGHTING (Xie et al. 2023) through the
    * weights-as-table seam: a (domain, proxy_loss, reference_loss)
    * table — losses measured by a PROXY training run and a reference
    * model, ridden in as data exactly like qualityClassifierWith's
    * weights (no training in-engine) — becomes normalized domain
    * weights and integer sampling quotas. Arithmetic, one shot of
    * the multiplicative-weights step: excess = clip(proxy − ref) to
    * [0, clip] (a domain the proxy already beats the reference on
    * has nothing left to learn — floor at 0), smoothed score =
    * exp(excess / T), ε-mixed with uniform (ε = 1/10, DoReMi's
    * starvation guard: a zero-excess domain still gets ε/k of the
    * budget), then largest-remainder rounding to quotas summing to
    * the budget EXACTLY — the same integer-scaled-weight contract as
    * [[qTemperatureMix]] (scores scale to integer millionths before
    * any ranking; ideals are ratios of exactly-representable
    * integers, so no engine's FP summation order can flip a
    * remainder rank).
    *
    * Scale shape: the loss table is domains-many rows (model-sized);
    * everything here is metadata-scale — the corpus is never touched.
    * The quotas feed the same machinery [[epochCopies]] consumes
    * (MixingClusteringSpec wires one through). */
  private[graft] def domainReweightWith(losses: DataFrame,
      budget: Long = ReweightBudget): DataFrame = {
    val wAll = Window.partitionBy()
    val wRem = Window.partitionBy().orderBy(desc("rem"), col("source"))
    losses
      .withColumn("excess",
        least(greatest(col("proxy_loss") - col("ref_loss"), lit(0.0)),
          lit(ReweightClip)))
      // integer millionths of the smoothed score (the [[weight]]
      // rationale): exp is the one transcendental, HALF-UP-scaled at
      // 6 decimals exactly once — the kmeans accepted-risk class
      .withColumn("wi", floor(exp(col("excess") / lit(ReweightTemp))
        * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("s_wi", sum("wi").over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
      // ideal = B·((1−ε)·wi/Σ + ε/k) with ε = 1/10, as ONE ratio of
      // exact integers: B·(9·wi·k + Σ) / (10·Σ·k) — numerator ≤
      // ~10¹² here, exactly representable; the division is a single
      // correctly-rounded IEEE op in both engines
      .withColumn("ideal",
        (lit(budget) * (lit(9L) * col("wi") * col("k") + col("s_wi")))
          .cast("double") /
        (lit(10L) * col("s_wi") * col("k")).cast("double"))
      .withColumn("base", floor(col("ideal")))
      .withColumn("rem", col("ideal") - col("base"))
      .withColumn("leftover", lit(budget) - sum("base").over(wAll))
      .withColumn("rr", row_number().over(wRem))
      .select(col("source"),
        graft.functions.Text.roundPortable(col("proxy_loss"), 4)
          .as("proxy_loss"),
        graft.functions.Text.roundPortable(col("ref_loss"), 4)
          .as("ref_loss"),
        graft.functions.Text.roundPortable(col("excess"), 4).as("excess"),
        graft.functions.Text.roundPortable(
          col("ideal") / lit(budget.toDouble), 6).as("weight"),
        (col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .cast("long").as("quota"))
      .orderBy("source")
  }

  /** The DoReMi quotas REALIZED — [[qDomainReweight]]'s weight table
    * fed through [[resampleByQuotas]], closing the reweight→resample
    * chain as one oracle-checked gate: per-source budget seats become
    * per-doc epoch copies by the exact integer hash threshold, so the
    * emitted mix IS the reweighted training stream a loader reads. */
  def qMixDoremi(spark: SparkSession, dir: String): DataFrame =
    resampleByQuotas(
        Tables.documents(spark, dir),
        qDomainReweight(spark, dir).select("source", "quota"))
      .select("source", "doc_id", "epoch")
      .orderBy("source", "doc_id", "epoch")

  /** Gate: [[domainReweightWith]] over a DETERMINISTIC synthetic loss
    * table — the fixture has no proxy run, so per-source losses are
    * md5 draws in [1, 3) (the eval_ece synthetic-correctness
    * precedent: the seam's arithmetic is exercised end to end and the
    * oracle replays the draws bit-for-bit; a real pipeline feeds real
    * measured losses through the same entry point). */
  def qDomainReweight(spark: SparkSession, dir: String): DataFrame = {
    def draw(seed: Column): Column =
      lit(1.0) + (conv(substring(md5(seed), 1, 6), 16, 10).cast("long")
        % 1000L).cast("double") / 500.0
    val losses = Tables.documents(spark, dir)
      .select("source").distinct()
      .select(col("source"),
        draw(col("source")).as("proxy_loss"),
        draw(concat(col("source"), lit("_ref"))).as("ref_loss"))
    domainReweightWith(losses)
  }
}
