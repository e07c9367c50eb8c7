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
  )
}
