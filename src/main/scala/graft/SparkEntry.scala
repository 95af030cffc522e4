package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{IOQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key pairs a Spark plan with (where deterministic) a
  * DuckDB `oracleSql` whose column names/order semantics match exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Query layer (Q1–Q15)
    "q_count" -> (Relational.qCount _),
    "q_limit" -> (Relational.qLimit _),
    "q_filter" -> (Relational.qFilter _),
    "q1_agg" -> (Relational.q1Agg _),
    "q_join" -> (Relational.qJoin _),
    "q_topk" -> (Relational.qTopK _),
    "q_daily" -> (Relational.qDaily _),
    "q_window" -> (Relational.qWindow _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_having" -> (Relational.qHaving _),
    "q_case" -> (Relational.qCase _),
    "q_antijoin" -> (Relational.qAntiJoin _),
    "q_subquery" -> (Relational.qSubquery _),
    "q_setops" -> (Relational.qSetOps _),
    "q_sql" -> (Relational.qSql _),
    // Transforms (T1–T4)
    "t_project_const" -> (Relational.tProjectConst _),
    "t_cast_rename" -> (Relational.tCastRename _),
    "t_nulls" -> (Relational.tNulls _),
    "t_dedup_key" -> (Relational.tDedupKey _),
    // Sources (S1–S4)
    "src_parquet" -> (IOQueries.srcParquet _),
    "src_csv" -> (IOQueries.srcCsv _),
    "src_json" -> (IOQueries.srcJson _),
    "src_autodetect" -> (IOQueries.srcAutodetect _),
    // Sinks (K1–K5)
    "sink_modes" -> (IOQueries.sinkModes _),
    "sink_compress" -> (IOQueries.sinkCompress _),
    "sink_csv" -> (IOQueries.sinkCsv _),
    "sink_partitioned" -> (IOQueries.sinkPartitioned _),
    "sink_warehouse" -> (IOQueries.sinkWarehouse _)
  )

  /** DuckDB-dialect oracle SQL, same column names as the Spark plans. */
  def oracleSql: Map[String, String] = Map(
    "q_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY spend DESC, c_custkey LIMIT 10""".stripMargin,
    "q_daily" ->
      """SELECT cast(ts AS date) AS d, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, rnk, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rnk,
        |    round(sum(o_totalprice) OVER w, 2) AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) > 35
        |ORDER BY l_partkey""".stripMargin,
    "q_case" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_antijoin" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders o
        |JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS cust_avg
        |      FROM orders GROUP BY 1) m ON o.o_custkey = m.k
        |WHERE o.o_totalprice > m.cust_avg
        |ORDER BY o_orderkey""".stripMargin,
    "q_setops" ->
      """SELECT tag, nk FROM (
        |  SELECT 'both' AS tag, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer
        |     INTERSECT SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'cust_only' AS tag, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer
        |     EXCEPT SELECT s_nationkey FROM supplier)
        |) ORDER BY tag, nk""".stripMargin,
    "q_sql" ->
      """SELECT r_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "t_project_const" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  'this is an artificial transformation just to practice prefect' AS transformation
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t_cast_rename" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  cast(floor(l_quantity) AS int) AS qty,
        |  cast(cast(l_extendedprice AS decimal(18,2)) AS double) AS price_dec,
        |  cast(l_shipdate AS date) AS ship_date
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,
    "t_nulls" ->
      """SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS status_maybe
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "t_dedup_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // Sources: the oracle aggregates the ORIGINAL parquet — a match
    // proves the write→read round-trip through the format was lossless.
    "src_parquet" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag <> 'N'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_csv" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_json" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  max(o_orderdate) AS last_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "src_autodetect" ->
      """SELECT * FROM (
        |  SELECT 'parquet' AS fmt, count(*) AS n, cast(sum(n_nationkey) AS bigint) AS key_sum FROM nation
        |  UNION ALL
        |  SELECT 'csv', count(*), cast(sum(n_nationkey) AS bigint) FROM nation
        |  UNION ALL
        |  SELECT 'json', count(*), cast(sum(n_nationkey) AS bigint) FROM nation
        |) ORDER BY fmt""".stripMargin,
    "sink_modes" ->
      """SELECT * FROM (
        |  SELECT '1_replace' AS step, count(*) AS n_rows, true AS ok FROM orders
        |  UNION ALL SELECT '2_append', 2 * count(*), true FROM orders
        |  UNION ALL SELECT '3_fail', 2 * count(*), true FROM orders
        |) ORDER BY step""".stripMargin,
    "sink_compress" ->
      """SELECT * FROM (
        |  SELECT 'gzip' AS codec, count(*) AS n, round(sum(l_extendedprice), 2) AS total FROM lineitem
        |  UNION ALL SELECT 'snappy', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |  UNION ALL SELECT 'zstd', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |) ORDER BY codec""".stripMargin,
    "sink_csv" ->
      """SELECT cast(ts AS date) AS d, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sink_partitioned" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sink_warehouse" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice
        |                 ELSE o_totalprice + 1000 END), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
