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
