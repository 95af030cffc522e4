package graft.oracles

import graft.queries.Analytics

/** DuckDB-dialect oracle SQL for the query-layer operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object QueryOracles {
  val sql: Map[String, String] = Map(
    "q_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
        |LIMIT 100""".stripMargin,
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
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p25,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50,
        |  round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p75,
        |  round(percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  (0, 0, 100000), (1, 100000, 200000), (2, 200000, 300000),
        |  (3, 300000, 400000), (4, 400000, 500000), (5, 500000, 1e18))
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin,
    "q_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_lag" ->
      """SELECT o_custkey, o_orderkey, days_since_prev FROM (
        |  SELECT o_custkey, o_orderkey,
        |    date_diff('day',
        |      CAST(lag(o_orderdate) OVER w AS DATE),
        |      CAST(o_orderdate AS DATE)) AS days_since_prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE days_since_prev IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_exists" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q_ntile" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT spend, ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
        |  FROM spend
        |)
        |SELECT decile, count(*) AS n_customers,
        |  round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_outer_join" ->
      """WITH cust AS (
        |  SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1
        |), supp AS (
        |  SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier
        |  WHERE s_acctbal < 0 GROUP BY 1
        |)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        |  cast(coalesce(n_cust, 0) AS bigint) AS n_cust,
        |  cast(coalesce(n_supp, 0) AS bigint) AS n_supp
        |FROM cust FULL JOIN supp ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,
    "q_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2
        |), r AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c
        |)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_native_sql" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(
        |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 20 AND b.vec_id < 20
        |ORDER BY id_a, id_b""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT l_partkey, count(*) AS n, (SELECT total FROM t) AS total
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) * 1500 > (SELECT total FROM t)
        |ORDER BY l_partkey""".stripMargin,
    // CMS prefilter + exact verify ≡ the exact heavy-hitters query —
    // the sketch only changes the plan, never the result
    "q_heavy_hitters_sketch" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT l_partkey, count(*) AS n, (SELECT total FROM t) AS total
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) * 1500 > (SELECT total FROM t)
        |ORDER BY l_partkey""".stripMargin,
    "q_mom" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT month, total, lag(total) OVER (ORDER BY month) AS prev_total FROM m
        |)
        |SELECT month, total, prev_total,
        |  CASE WHEN prev_total IS NOT NULL
        |    THEN CAST(round((total - prev_total) / prev_total * 1e6) AS BIGINT)
        |  END AS delta_micro
        |FROM l ORDER BY month""".stripMargin,
    // Welch's t between the two user-parity cohorts, formula replayed
    // verbatim (var_samp in both engines)
    "q_ab_test" ->
      """WITH p AS (
        |  SELECT user_id % 2 AS variant, value FROM events
        |  WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT variant, cast(count(*) AS bigint) AS n, avg(value) AS m,
        |    var_samp(value) AS v
        |  FROM p GROUP BY 1
        |)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round(a.m - b.m, 4) AS mean_diff,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
        |  abs((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n)) > 1.96 AS significant
        |FROM s a, s b WHERE a.variant = 0 AND b.variant = 1""".stripMargin,
    // the oracle joins the RAW theta form — the banded equi-join plan
    // must lose and double nothing
    "q_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, CAST(ts AS DATE) AS d FROM events
        |), a AS (
        |  SELECT user_id, d, min(tns) AS a_lo, max(tns) AS a_hi
        |  FROM e GROUP BY 1, 2
        |), b AS (
        |  SELECT d AS wd,
        |    epoch_ns(CAST(d AS TIMESTAMP)) + 18::BIGINT * 3600 * 1000000000 AS b_lo,
        |    epoch_ns(CAST(d AS TIMESTAMP)) + 30::BIGINT * 3600 * 1000000000 AS b_hi
        |  FROM (SELECT DISTINCT d FROM e)
        |  WHERE datediff('day', DATE '1970-01-01', d) % 3 = 0
        |)
        |SELECT wd, cast(count(*) AS bigint) AS n_user_days,
        |  cast(sum(least(a_hi, b_hi) - greatest(a_lo, b_lo)) AS bigint)
        |    AS overlap_total_ns
        |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |GROUP BY 1 ORDER BY wd""".stripMargin,
    // skew_handled pinned TRUE: the correctness gate fails if AQE's
    // OptimizeSkewedJoin ever stops firing on the hot key
    "q_aqe_skew" ->
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |              ELSE 1 + l_orderkey % 19 END AS k, l_quantity
        |  FROM lineitem
        |), d AS (
        |  SELECT o_orderkey % 20 AS k2, round(sum(o_totalprice), 2) AS k_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT k, cast(count(*) AS bigint) AS n,
        |  round(sum(l_quantity), 2) AS qty, max(k_total) AS k_total,
        |  true AS skew_handled
        |FROM f JOIN d ON k = k2 GROUP BY k ORDER BY k""".stripMargin,
    // the closing double formula is THE SAME generated text as the
    // Spark side (Analytics.momentExprs) over the same exact integer
    // power sums — IEEE-correctly-rounded ops only, so bit-identical
    "q_moments" -> {
      val sums = Seq("q", "p", "d").flatMap(c => Seq(
        s"sum($c) AS ${c}1", s"sum($c*$c) AS ${c}2",
        s"sum($c*$c*$c) AS ${c}3", s"sum($c*$c*$c*$c) AS ${c}4"))
        .mkString(", ")
      def sel(name: String, c: String) =
        s"SELECT '$name' AS col_name, n, " +
          Analytics.momentExprs(c).mkString(", ") + " FROM s"
      s"""WITH c AS (
         |  SELECT CAST(round(l_quantity*100, 0) AS HUGEINT) AS q,
         |    CAST(round(l_extendedprice*100, 0) AS HUGEINT) AS p,
         |    CAST(round(l_discount*100, 0) AS HUGEINT) AS d
         |  FROM lineitem
         |), s AS (
         |  SELECT $sums, CAST(count(*) AS BIGINT) AS n FROM c
         |)
         |${sel("l_quantity", "q")}
         |UNION ALL ${sel("l_extendedprice", "p")}
         |UNION ALL ${sel("l_discount", "d")}
         |ORDER BY col_name""".stripMargin
    },
    "q_rolling_7d" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS day_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT d, day_total,
        |  round(sum(day_total) OVER (ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rolling_7d
        |FROM daily ORDER BY d""".stripMargin,
    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS day_micro
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, d, day_micro,
        |  median(day_micro) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS med7_micro
        |FROM daily ORDER BY event_type, d""".stripMargin,
    "q_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
        |    AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))
        |ORDER BY p_size, p_partkey""".stripMargin,
    // Q52: the SCD2 build is replayed inline (lag-filter-lead, T17's
    // exact window order), then facts resolve by key-equi + range
    "q_pit_join" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders
        |), v AS (
        |  SELECT o_custkey, status, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM ch WHERE prev IS NULL OR prev <> status
        |)
        |SELECT v.status, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l.l_extendedprice), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN v ON o.o_custkey = v.o_custkey
        |  AND l.l_shipdate >= v.valid_from
        |  AND (v.valid_to IS NULL OR l.l_shipdate < v.valid_to)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bloom_semi" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // Q50: the bloom is a pre-filter only — the exact inner join
    // defines the result, so the oracle is the plain join
    "q_bloom_join_rule" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "q_streaks" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), g AS (
        |  SELECT user_id, day,
        |    datediff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM act
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days,
        |  min(day) AS start_day, max(day) AS end_day
        |FROM g GROUP BY user_id, grp
        |ORDER BY streak_days DESC, user_id, start_day LIMIT 25""".stripMargin,
    // the runtime-pruned partitioned join must equal the raw-table join
    "q_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
        |  FROM orders
        |  WHERE substr(strftime(o_orderdate, '%Y-%m'), 1, 4) = '1996'
        |    AND substr(strftime(o_orderdate, '%Y-%m'), 6, 2) IN ('01', '02', '03')
        |)
        |SELECT f.ship_month, cast(count(*) AS bigint) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |        l_quantity, l_extendedprice FROM lineitem) f
        |JOIN dim USING (ship_month)
        |GROUP BY 1 ORDER BY ship_month""".stripMargin,
    "q_mad_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), med AS (
        |  SELECT event_type,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
        |  FROM daily GROUP BY event_type
        |), wm AS (
        |  SELECT daily.event_type, d, n, med, abs(n - med) AS ad
        |  FROM daily JOIN med USING (event_type)
        |), mad AS (
        |  SELECT event_type,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        |  FROM wm GROUP BY event_type
        |)
        |SELECT wm.event_type, d, n, med, mad,
        |  CASE WHEN mad > 0 THEN CAST(round(CAST(ad AS DOUBLE) * 1e6 /
        |    (1.4826 * CAST(mad AS DOUBLE))) AS BIGINT) END AS robust_z_micro,
        |  (mad > 0 AND CAST(ad AS DOUBLE) > 3.0 * 1.4826 * CAST(mad AS DOUBLE))
        |    AS is_outlier
        |FROM wm JOIN mad USING (event_type)
        |ORDER BY event_type, d""".stripMargin,
    "q_winsorize" ->
      """WITH p AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS v
        |  FROM orders
        |), cuts AS (
        |  SELECT grp,
        |    CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p_lo,
        |    CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p_hi
        |  FROM p GROUP BY 1
        |)
        |SELECT p.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(sum(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  min(p_lo) AS p_lo_micro, min(p_hi) AS p_hi_micro,
        |  CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS mean_micro,
        |  CAST(round(CAST(sum(CAST(least(greatest(v, p_lo), p_hi) AS HUGEINT)) AS DOUBLE)
        |    / count(*)) AS BIGINT) AS wmean_micro
        |FROM p JOIN cuts USING (grp)
        |GROUP BY p.grp ORDER BY p.grp""".stripMargin,
    // Q51: the oracle checks the SERVED RESULT equals the direct
    // aggregate — the substitution itself (MV files scanned, orders
    // untouched) is plan-asserted in Round17Spec
    "q_mv_rewrite" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q55: the oracle checks the SERVED RESULT equals the direct
    // monthly aggregate — the rollup substitution itself (MV files
    // scanned with a re-agg node, orders untouched) is plan-asserted
    // in Round28Spec
    "q_mv_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  max(o_totalprice) AS mx
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
        |), n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
        |ic AS (SELECT i, count(*) AS c_i FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT x.i AS a, y.i AS b, count(*) AS c_ab
        |  FROM items x JOIN items y ON x.o = y.o AND x.i < y.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), rules AS (
        |  SELECT a AS ante, b AS cons, c_ab FROM pairs
        |  UNION ALL
        |  SELECT b AS ante, a AS cons, c_ab FROM pairs
        |)
        |SELECT r.ante, r.cons, CAST(r.c_ab AS BIGINT) AS c_ab,
        |  CAST(ia.c_i AS BIGINT) AS c_ante, CAST(ic2.c_i AS BIGINT) AS c_cons,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * 1e6 / n.n_orders) AS BIGINT)
        |    AS support_micro,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * 1e6 / ia.c_i) AS BIGINT)
        |    AS conf_micro,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * n.n_orders * 1e6 /
        |    (CAST(ia.c_i AS DOUBLE) * ic2.c_i)) AS BIGINT) AS lift_micro
        |FROM rules r
        |JOIN ic ia ON ia.i = r.ante
        |JOIN ic ic2 ON ic2.i = r.cons, n
        |ORDER BY lift_micro DESC, ante, cons LIMIT 20""".stripMargin,
    // variable binding must be invisible: literal-inlined equivalent
    "q_sql_script" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_quantity >= 45.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q53: the bound parameters inlined as literals — what the marker
    // binding itself produces
    "q_sql_params" ->
      """SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |  AND o_totalprice > 50000.0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // Q54: the pipe chain replayed in classic SQL — the chain is
    // parser sugar, so the classic spelling must hash-match exactly
    "q_sql_pipe" ->
      """SELECT l_returnflag, l_linestatus, cast(count(*) AS bigint) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  round(avg(l_quantity), 4) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate IS NOT NULL AND l_quantity > 10
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 0
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_lateral" ->
      """SELECT c_custkey, t.o_orderkey,
        |       round(t.o_totalprice, 2) AS o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_recursive" ->
      """WITH RECURSIVE pc AS (
        |  SELECT DISTINCT l_partkey AS part, o_custkey AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), edges AS (
        |  SELECT a.cust AS src, b.cust AS dst
        |  FROM pc a JOIN pc b ON a.part = b.part AND a.cust <> b.cust
        |  GROUP BY 1, 2 HAVING count(*) >= 4
        |), seeds AS (
        |  SELECT c_custkey AS cust FROM customer WHERE c_acctbal > 9900
        |), hops (cust, hop) AS (
        |  SELECT cust, 0 FROM seeds
        |  UNION ALL
        |  SELECT e.dst, h.hop + 1
        |  FROM hops h JOIN edges e ON e.src = h.cust
        |  WHERE h.hop < 2
        |)
        |SELECT cust, CAST(min(hop) AS INT) AS hop
        |FROM hops GROUP BY cust ORDER BY cust""".stripMargin,
    // the windowed-coverage explosion must equal the direct per-day
    // windowed distinct
    "q_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        |), days AS (SELECT DISTINCT d FROM du)
        |SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_active_7d
        |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
        |GROUP BY days.d ORDER BY days.d""".stripMargin
  )
}
