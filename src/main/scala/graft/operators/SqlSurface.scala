package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-driven entry points for the LLM-pipeline operators — the
  * reference's posture is that EVERYTHING is reachable through
  * `sqlContext.sql(...)` over registered tables (reference:
  * AreaTop3ProductSpark.java:309-316, 384-409 drives its whole
  * pipeline that way); until round 11 our pack/mix/dedup family was
  * DataFrame-only (q_sql_interface covers the relational side).
  *
  * Each entry here: registers the fixture tables as temp views +
  * installs the graft SQL functions
  * ([[graft.plans.GraftExtensions.install]] — custom kernels like
  * `bpe_token_count`, `shingles3`, `simhash64` become callable from
  * SQL), then runs ONE `spark.sql` statement. The SQL text expresses
  * the same SCALE-SHAPED plan as the DataFrame twin — the pack
  * variant carries the two-phase hash-bucket prefix sum in its CTE
  * structure, not the single-partition global window the naive SQL
  * would use — so driving through SQL costs no scalability. Gated
  * against the SAME oracles as the DataFrame twins (pack_sequences /
  * dedup_exact / q_temperature_mix): identical rows from both
  * surfaces is the contract.
  *
  * View registration is per-call and session-global (temp views are
  * session state); callers running concurrent queries against
  * DIFFERENT sf dirs in one session would race on the view names —
  * the driver's verify/bench loops are serial, and a production
  * deployment registers its catalog once.
  */
object SqlSurface {

  private def install(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    graft.plans.GraftExtensions.install(spark)
  }

  /** Two-phase concat-and-chunk packing, driven entirely from SQL.
    * Same plan family as [[Packing.qPackSequences]]: per-bucket
    * running sums partitioned on `doc_id DIV √n` (footer-derived
    * width — no job), ONE global window over only the ~√n bucket
    * subtotals, broadcast back. The token counter is the registered
    * `bpe_token_count` SQL function — the same codegen'd composition
    * the DataFrame path uses, not a reimplementation. */
  def qPackSequencesSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    val n = Tables.parquetRowCount(spark, s"$dir/documents.parquet")
    val w = Packing.bucketWidthFor(n)
    spark.sql(
      s"""WITH t AS (SELECT doc_id,
         |            CAST(bpe_token_count(text) AS BIGINT) AS n_bpe_tokens
         |            FROM documents),
         |b AS (SELECT doc_id, n_bpe_tokens, doc_id DIV $w AS bucket FROM t),
         |intra AS (SELECT doc_id, n_bpe_tokens, bucket,
         |    sum(n_bpe_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |        ROWS UNBOUNDED PRECEDING) - n_bpe_tokens AS intra_excl
         |  FROM b),
         |btot AS (SELECT bucket, sum(n_bpe_tokens) AS btot FROM b GROUP BY bucket),
         |pre AS (SELECT bucket,
         |    sum(btot) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) - btot
         |      AS bucket_excl
         |  FROM btot)
         |SELECT /*+ BROADCAST(p) */ i.doc_id, i.n_bpe_tokens,
         |       (i.intra_excl + p.bucket_excl) DIV 256 AS seq_id,
         |       CAST((i.intra_excl + p.bucket_excl) % 256 AS BIGINT) AS seq_offset
         |FROM intra i JOIN pre p ON i.bucket = p.bucket
         |ORDER BY doc_id""".stripMargin)
  }

  /** Exact dedup from SQL — one hash aggregate on the content
    * fingerprint, the same single-shuffle plan as
    * [[Dedup.qDedupExact]]. */
  def qDedupExactSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    spark.sql(
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin)
  }

  /** Paragraph-level dedup with reassembly from SQL — the same
    * two-shuffle plan as [[Dedup.qDedupParagraphs]] (segment-hash
    * window for corpus-wide first occurrence, doc_id aggregate to
    * reassemble), expressed as one statement: the generator, the
    * md5-partitioned window, and the ordered struct-sort rebuild all
    * have direct SQL spellings, so the curation recipe is fully
    * drivable from a SQL-only client. */
  def qDedupParagraphsSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    spark.sql(
      """WITH d AS (SELECT doc_id,
        |            filter(split(text, '\\s+'), t -> t != '') AS toks
        |          FROM documents),
        |t AS (SELECT doc_id, toks,
        |        greatest(1L, CAST(ceil(size(toks) / 16.0) AS BIGINT)) AS n_segs
        |      FROM d),
        |e AS (SELECT doc_id, toks, n_segs,
        |        explode(sequence(0L, n_segs - 1)) AS seg_idx FROM t),
        |segs AS (SELECT doc_id, n_segs, seg_idx,
        |        concat_ws(' ',
        |          slice(toks, CAST(seg_idx * 16 AS INT) + 1, 16)) AS seg
        |      FROM e),
        |kept AS (SELECT * FROM (SELECT *,
        |        row_number() OVER (PARTITION BY md5(seg)
        |                           ORDER BY doc_id, seg_idx) AS rn
        |      FROM segs) WHERE rn = 1)
        |SELECT doc_id, n_segs, count(*) AS n_kept,
        |       array_join(transform(
        |         array_sort(collect_list(struct(seg_idx, seg))),
        |         s -> s.seg), ' ') AS text_kept
        |FROM kept GROUP BY doc_id, n_segs ORDER BY doc_id""".stripMargin)
  }

  /** BM25 batch retrieval against the STANDING posting index, driven
    * from SQL — the serving-family twin the r12 verdict asked for: a
    * SQL-speaking consumer's whole search is one statement over the
    * catalog tables ([[TextAnalysis.buildTextIndex]]'s `bm25_index` +
    * its `_stats` row). Same plan family as
    * [[TextAnalysis.qTextBm25Indexed]]: the posting scan carries a
    * LITERAL term IN-list (interpolated from the request batch — a
    * join predicate would not prune buckets at plan time), df is a
    * partial agg over the pruned postings joined back, per-term
    * contributions are HALF-UP-6 rounded and summed as
    * DECIMAL(20,6) (exact, order-independent — the bm25Batch
    * determinism contract), then one panel-sized rank window. Gated
    * against the SAME oracle as text_bm25_batch / text_bm25_indexed:
    * three plans, one semantics. */
  def qTextBm25Sql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    TextAnalysis.buildTextIndex(spark, dir, "bm25_index")
    val batch = TextAnalysis.Bm25BatchQueries
    // serving seam: caller-supplied terms ride into string literals —
    // escape quotes so a term like "o'brien" can't break (or inject
    // into) the statement
    def lit(t: String): String = "'" + t.replace("'", "''") + "'"
    val qtRows = batch.flatMap { case (q, text) =>
      text.split("\\s+").filter(_.nonEmpty).groupBy(identity).toSeq
        .map { case (t, g) => (q, t, g.length) }
    }.sortBy(x => (x._1, x._2))
      .map { case (q, t, n) => s"($q, ${lit(t)}, $n.0)" }.mkString(", ")
    val termList = batch.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .distinct.sorted.map(lit).mkString(", ")
    spark.sql(
      s"""WITH stats AS (SELECT n,
         |    CASE WHEN n = 0 THEN 0.0 ELSE sum_dl / n END AS avgdl
         |  FROM bm25_index_stats),
         |qt (q_id, term, qtf) AS (VALUES $qtRows),
         |pruned AS (SELECT term, doc_id, dl, tf FROM bm25_index
         |           WHERE term IN ($termList)),
         |dfp AS (SELECT term, count(*) AS df FROM pruned GROUP BY term),
         |scored AS (SELECT /*+ BROADCAST(dfp, qt, stats) */ q_id, doc_id,
         |    sum(CAST(floor((ln(1.0 + (n - df + 0.5) / (df + 0.5)) * qtf * tf /
         |          (tf + 1.2 * (0.25 + 0.75 * dl / greatest(avgdl, 0.000000001))))
         |        * 1000000 + 0.5) / 1000000 AS DECIMAL(20,6))) AS score_dec
         |  FROM pruned JOIN dfp USING (term) JOIN qt USING (term) CROSS JOIN stats
         |  GROUP BY q_id, doc_id),
         |r AS (SELECT q_id, doc_id, score_dec,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |        ORDER BY score_dec DESC, doc_id) AS BIGINT) AS rank
         |  FROM scored WHERE score_dec > 0)
         |SELECT CAST(q_id AS BIGINT) AS q_id, rank, doc_id,
         |       floor(CAST(score_dec AS DOUBLE) * 10000 + 0.5) / 10000 AS score
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)
  }

  /** The query batch's probe ranking over the standing IVF
    * centroids, as SQL text (shared by the probe-planning statement
    * and the search statement so the two can't drift). */
  private val IvfProbeCte =
    """q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
      |       WHERE vec_id < 10),
      |rk AS (SELECT q_id, q_vec, c_id,
      |    row_number() OVER (PARTITION BY q_id
      |        ORDER BY cosine_similarity(q_vec, c_vec) DESC, c_id) AS rn
      |  FROM q CROSS JOIN ivf_sq8_index_centroids)""".stripMargin

  /** ANN search against the STANDING SQ8 IVF index from SQL — the
    * vector serving twin: probe planning ranks the query batch
    * against the centroids table (the `cosine_similarity` SQL
    * function is the same Catalyst kernel the DataFrame path uses),
    * the probed cell ids come back as a batch-sized collect (the
    * [[Similarity.searchIvfIndex]] shape) and enter the search
    * statement as a LITERAL bucket IN-list so the bucketed index
    * scan is pruned to the probed cells; stored codes reconstruct
    * in-plan (`vmin + code·scl`, the identical expression). Gated
    * against the SAME oracle as sim_ivf_sq8 / sim_ivf_indexed. */
  def qSimIvfSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    Similarity.buildIvfIndex(spark, dir, "ivf_sq8_index")
    // phase 1, query planning: probed cells (batch-sized collect)
    val probed = spark.sql(
      s"""WITH $IvfProbeCte
         |SELECT DISTINCT c_id FROM rk WHERE rn <= 1""".stripMargin)
      .collect().map(_.getLong(0)).sorted
    spark.sql(
      s"""WITH $IvfProbeCte,
         |probe AS (SELECT q_id, q_vec, c_id AS q_bucket FROM rk WHERE rn <= 1),
         |cells AS (SELECT vec_id, bucket,
         |    transform(codes, c -> vmin + CAST(c AS DOUBLE) * scl) AS recon
         |  FROM ivf_sq8_index WHERE bucket IN (${
           // an EMPTY probe set (empty corpus/index) must stay valid
           // SQL: -1 is never a real bucket id
           if (probed.isEmpty) "-1" else probed.mkString(", ")})),
         |scored AS (SELECT /*+ BROADCAST(probe) */ q_id,
         |    vec_id AS neighbor_id, cosine_similarity(q_vec, recon) AS sim
         |  FROM cells JOIN probe ON bucket = q_bucket AND vec_id != q_id),
         |r AS (SELECT q_id, neighbor_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, neighbor_id,
         |       floor(sim * 10000 + 0.5) / 10000 AS sim
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)
  }

  /** Per-domain capping from SQL — the governance twin of
    * [[Mixing.qDomainCap]]: a SQL-speaking consumer's cap is the
    * window formulation (rank ≤ cap per source); the DataFrame twin
    * computes the SAME rows on the bounded-heap GroupedTopK — the
    * custom physical operator stays a DataFrame-side optimization,
    * exactly the temperature-mix twin's division of labor. Gated
    * against the same oracle. */
  def qDomainCapSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    spark.sql(
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |        ORDER BY n_chars DESC, doc_id) AS BIGINT) AS `rank`
        |  FROM documents)
        |SELECT doc_id, source, n_chars, `rank`
        |FROM r WHERE `rank` <= 5 ORDER BY doc_id""".stripMargin)
  }

  /** Temperature-sampled mixing (T=2 ⇒ √count weights, 200-doc
    * target, largest-remainder integer split, md5-ordered quota fill)
    * from SQL. The quota CTEs run over the handful of strata (window
    * over ~|langs| rows); the corpus side sees one partitioned
    * rank window + a broadcast quota join — mirror of
    * [[Mixing.qTemperatureMix]] minus the bounded-heap prune (SQL's
    * rank-filter is the window formulation; the custom GroupedTopK
    * operator stays a DataFrame-side optimization). */
  def qTemperatureMixSql(spark: SparkSession, dir: String): DataFrame = {
    install(spark, dir)
    spark.sql(
      """WITH st AS (SELECT lang, count(*) AS g_cnt FROM documents GROUP BY lang),
        |sw AS (SELECT lang,
        |    CAST(floor(sqrt(CAST(g_cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS w
        |  FROM st),
        |qt AS (SELECT lang,
        |    200 * CAST(w AS DOUBLE) / CAST(sum(w) OVER () AS DOUBLE) AS ideal
        |  FROM sw),
        |qb AS (SELECT lang, CAST(floor(ideal) AS BIGINT) AS base,
        |       ideal - floor(ideal) AS rem FROM qt),
        |qf AS (SELECT lang, base, 200 - sum(base) OVER () AS leftover,
        |       row_number() OVER (ORDER BY rem DESC, lang) AS rr FROM qb),
        |qq AS (SELECT lang,
        |       base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS quota
        |  FROM qf),
        |r AS (SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT /*+ BROADCAST(qq) */ lang, doc_id
        |FROM r JOIN qq USING (lang) WHERE rn <= quota
        |ORDER BY lang, doc_id""".stripMargin)
  }
}
