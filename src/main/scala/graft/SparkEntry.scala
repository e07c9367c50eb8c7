package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator has a `queries` entry (Spark DataFrame
  * program) and, where SQL-expressible, an `oracleSql` entry (DuckDB
  * SQL over the same parquet tables). Column names are aligned
  * between the two on purpose: the driver sorts columns by name
  * before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"             -> (Relational.q1Agg _),
    "q_scan_filter"      -> (Relational.qScanFilter _),
    "q_join_broadcast"   -> (Relational.qJoinBroadcast _),
    "q_join_shuffle"     -> (Relational.qJoinShuffle _),
    "q_semi_join"        -> (Relational.qSemiJoin _),
    "q_anti_join"        -> (Relational.qAntiJoin _),
    "q_left_join_zerofill" -> (Relational.qLeftJoinZerofill _),
    "q_topk_multisort"   -> (Relational.qTopKMultiSort _),
    "q_sessionize"       -> (Sessions.qSessionize _),
    "q_session_stats"    -> (Sessions.qSessionStats _),
    "q_page_convert_rate" -> (Sessions.qPageConvertRate _),
    "q_area_top3"        -> (AreaTop3.qAreaTop3 _),
    "q_window_topn"      -> (AreaTop3.qWindowTopN _),
    "q_json_extract"     -> (Scalars.qJsonExtract _),
    "q_date_buckets"     -> (Scalars.qDateBuckets _),
    "q_date_hour"        -> (Scalars.qDateHour _),
    "q_concat_conditional" -> (Scalars.qConcatConditional _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         count(*) AS count_order,
         round(avg(l_discount), 6) AS avg_disc
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_scan_filter" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
           AND l_discount > 0.05
         ORDER BY l_orderkey, l_partkey, l_quantity""",
    "q_join_broadcast" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
         count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY region_name, nation_name""",
    "q_join_shuffle" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_lines,
         round(sum(l_quantity), 2) AS qty
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_without_orders
         FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_left_join_zerofill" ->
      """SELECT p_partkey,
         coalesce(cnt, 0) AS order_count,
         coalesce(qty, 0.0) AS total_qty
         FROM part LEFT JOIN (
           SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
           FROM lineitem GROUP BY l_partkey
         ) ON p_partkey = l_partkey
         ORDER BY p_partkey""",
    "q_topk_multisort" ->
      """SELECT l_partkey,
         count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS click_count,
         count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS order_count,
         count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS pay_count
         FROM lineitem GROUP BY l_partkey
         ORDER BY click_count DESC, order_count DESC, pay_count DESC, l_partkey
         LIMIT 10""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, event_type, ts,
                    epoch_ns(ts)//1000000000 AS ts_sec FROM events),
         g AS (SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
                OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
         SELECT user_id, session_idx, min(ts_sec) AS start_sec,
                max(ts_sec) - min(ts_sec) AS visit_length,
                count(*) AS step_length,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
         FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, event_id, ts,
                    epoch_ns(ts)//1000000000 AS ts_sec FROM events),
         g AS (SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
                OR ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_idx FROM g),
         sess AS (SELECT user_id, session_idx,
                  max(ts_sec) - min(ts_sec) AS visit_length,
                  count(*) AS step_length
                  FROM s GROUP BY user_id, session_idx)
         SELECT count(*) AS session_count,
           round(sum(CASE WHEN visit_length <= 60 THEN 1 ELSE 0 END) / count(*), 2) AS visit_1m,
           round(sum(CASE WHEN visit_length > 60 AND visit_length <= 600 THEN 1 ELSE 0 END) / count(*), 2) AS visit_1m_10m,
           round(sum(CASE WHEN visit_length > 600 AND visit_length <= 1800 THEN 1 ELSE 0 END) / count(*), 2) AS visit_10m_30m,
           round(sum(CASE WHEN visit_length > 1800 THEN 1 ELSE 0 END) / count(*), 2) AS visit_30m_plus,
           round(sum(CASE WHEN step_length <= 3 THEN 1 ELSE 0 END) / count(*), 2) AS step_1_3,
           round(sum(CASE WHEN step_length > 3 AND step_length <= 9 THEN 1 ELSE 0 END) / count(*), 2) AS step_4_9,
           round(sum(CASE WHEN step_length > 9 THEN 1 ELSE 0 END) / count(*), 2) AS step_10_plus
         FROM sess""",
    "q_page_convert_rate" ->
      """WITH p AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS prev_type, event_type FROM events),
         pc AS (SELECT prev_type || '_' || event_type AS split, count(*) AS pv
                FROM p WHERE prev_type IS NOT NULL GROUP BY 1),
         pos AS (SELECT * FROM (VALUES ('view_click', 1), ('click_purchase', 2)) t(split, pos)),
         j AS (SELECT pos.split, pos.pos, pc.pv FROM pos JOIN pc ON pos.split = pc.split),
         st AS (SELECT count(*) AS start_pv FROM events WHERE event_type = 'view')
         SELECT split, pv,
                round(pv / coalesce(lag(pv) OVER (ORDER BY pos), start_pv), 4) AS convert_rate
         FROM j CROSS JOIN st ORDER BY split""",
    "q_area_top3" ->
      """WITH fact AS (
           SELECT r_name AS area, l_partkey AS product_id, n_name
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         counts AS (SELECT area, product_id, count(*) AS click_count,
                    string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nation_names
                    FROM fact GROUP BY area, product_id),
         ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY area
                    ORDER BY click_count DESC, product_id) AS BIGINT) AS "rank" FROM counts)
         SELECT area,
           CASE WHEN area IN ('AMERICA', 'ASIA') THEN 'A Level'
                WHEN area = 'EUROPE' THEN 'B Level'
                WHEN area = 'AFRICA' THEN 'C Level'
                ELSE 'D Level' END AS area_level,
           product_id, p_name AS product_name, click_count, nation_names, "rank"
         FROM ranked JOIN part ON product_id = p_partkey
         WHERE "rank" <= 3 ORDER BY area, "rank" """,
    "q_window_topn" ->
      """WITH ranked AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS "rank" FROM orders)
         SELECT o_orderpriority, "rank", o_orderkey, round(o_totalprice, 2) AS total_price
         FROM ranked WHERE "rank" <= 3 ORDER BY o_orderpriority, "rank" """,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS n, round(sum(value), 2) AS total_value
         FROM events GROUP BY 1 ORDER BY k""",
    "q_date_buckets" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1 ORDER BY month""",
    "q_date_hour" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS date, CAST(hour(ts) AS BIGINT) AS hour,
         count(*) AS n_events
         FROM events GROUP BY 1, 2 ORDER BY date, hour""",
    "q_concat_conditional" ->
      """SELECT c_custkey || ':' || c_name AS custkey_name,
         CASE WHEN c_acctbal > 0 THEN 'positive' ELSE 'non_positive' END AS balance_status
         FROM customer ORDER BY custkey_name""",
  )
}
