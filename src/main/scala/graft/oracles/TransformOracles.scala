package graft.oracles

/** DuckDB-dialect oracle SQL for the transform & data-quality operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object TransformOracles {
  val sql: Map[String, String] = Map(
    "t_sample_hash" ->
      """SELECT l_returnflag, count(*) AS n_sampled, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |WHERE (CAST(l_orderkey AS BIGINT) * 2654435761
        |     + CAST(l_linenumber AS BIGINT) * 40503) % 4294967296 % 20 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t_zorder" -> {
      val terms = (0 until 10).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) + (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT (CAST(o_custkey AS BIGINT) % 1024) AS x,
         |    (CAST(floor(o_totalprice / 1000) AS BIGINT) % 1024) AS y
         |  FROM orders
         |), z AS (
         |  SELECT x, y, ($terms) AS zkey FROM d
         |)
         |SELECT (zkey >> 12) AS bucket, count(*) AS n,
         |  min(x) AS min_cust, max(x) AS max_cust,
         |  min(y) AS min_band, max(y) AS max_band
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "t_scd2" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER w AS prev
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), chg AS (
        |  SELECT o_custkey, status, o_orderdate, o_orderkey
        |  FROM o WHERE prev IS NULL OR prev <> status
        |)
        |SELECT o_custkey,
        |  CAST(row_number() OVER w2 AS INT) AS version,
        |  status,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w2 AS valid_to,
        |  (lead(o_orderdate) OVER w2 IS NULL) AS is_current
        |FROM chg WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "t_stratified_sample" ->
      """SELECT o_orderstatus, count(*) AS n_sampled,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE (CAST(o_orderkey AS BIGINT) * 2654435761) % 4294967296
        |  % (CASE WHEN o_orderstatus = 'F' THEN 10
        |          WHEN o_orderstatus = 'O' THEN 20 ELSE 2 END) = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "t_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "dq_rules" ->
      """WITH rules AS (
        |  SELECT 'null_quantity' AS rule,
        |    cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'range_quantity',
        |    cast(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS bigint)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'dup_pk', cast(coalesce(sum(n - 1), 0) AS bigint)
        |  FROM (SELECT count(*) AS n FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber) WHERE n > 1
        |  UNION ALL
        |  SELECT 'orphan_lineitem', cast(count(*) AS bigint)
        |  FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |)
        |SELECT rule, n_violations, n_violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin,
    // leave-one-out encode (sum-x)/(n-1) replayed per row, then the
    // same per-category summary
    "t_target_encode" ->
      """WITH stats AS (
        |  SELECT o_orderpriority, sum(o_totalprice) AS cat_sum,
        |    cast(count(*) AS bigint) AS cat_n
        |  FROM orders GROUP BY 1
        |), enc AS (
        |  SELECT o.o_orderpriority,
        |    (s.cat_sum - o.o_totalprice) / (s.cat_n - 1) AS loo_enc
        |  FROM orders o JOIN stats s USING (o_orderpriority)
        |)
        |SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  round(avg(loo_enc), 2) AS enc_avg,
        |  round(min(loo_enc), 2) AS enc_min,
        |  round(max(loo_enc), 2) AS enc_max
        |FROM enc GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // identical md5-prefix bucket arithmetic: split is a pure function
    // of source, so cross-split leakage is structurally impossible
    "t_group_split" ->
      """WITH d AS (
        |  SELECT *, substr(md5('split2:' || source), 1, 2) AS b FROM documents
        |)
        |SELECT CASE WHEN b < 'cc' THEN 'train'
        |            WHEN b < 'e6' THEN 'val' ELSE 'test' END AS split,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(count(DISTINCT source) AS bigint) AS n_sources,
        |  cast(sum(n_chars) AS bigint) AS total_chars
        |FROM d GROUP BY 1 ORDER BY split""".stripMargin,
    // identical per-line micro-rounding + integer bucket arithmetic
    "t_reconcile" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 1e6) AS BIGINT)) AS BIGINT) AS li_micro
        |  FROM lineitem GROUP BY 1
        |), o AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 1e6) AS BIGINT) AS o_micro
        |  FROM orders
        |), j AS (
        |  SELECT o_micro, li_micro, o_micro - li_micro AS drift,
        |    CASE WHEN li_micro IS NULL THEN '1_header_without_lines'
        |         WHEN o_micro IS NULL THEN '2_lines_without_header'
        |         WHEN abs(o_micro - li_micro) * 100 <= o_micro THEN '3_drift_within_1pct'
        |         ELSE '4_drift_over_1pct' END AS bucket
        |  FROM o FULL OUTER JOIN li ON o_orderkey = l_orderkey
        |)
        |SELECT bucket, cast(count(*) AS bigint) AS n,
        |  cast(sum(coalesce(drift, 0)) AS bigint) AS drift_micro_total
        |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin,
    // same percentile_disc cuts, same right-closed bin arithmetic
    "t_quantile_bin" -> {
      val qs = (1 until 10).map(i => i / 10.0)
      s"""WITH p AS (
         |  SELECT CAST(round(o_totalprice * 1e6) AS BIGINT) AS v FROM orders
         |), a AS (
         |  SELECT quantile_cont(v, [${qs.mkString(", ")}]) AS cuts FROM p
         |)
         |SELECT CAST(len(list_filter(cuts, x -> v >= x)) AS INTEGER) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  min(v) AS min_micro, max(v) AS max_micro,
         |  CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT)
         |    AS mean_micro
         |FROM p, a GROUP BY 1 ORDER BY bin""".stripMargin
    },
    "t_profile" ->
      """WITH s AS (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_orderdate),
        |    CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |  FROM orders
        |)
        |SELECT * FROM s ORDER BY col_name""".stripMargin,
    "t_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |typos AS (
        |  SELECT concat(
        |    substr(name, 1, CAST(floor((length(name) + 1) / 2) AS INT) - 1),
        |    substr(name, CAST(floor((length(name) + 1) / 2) AS INT) + 1)) AS name
        |  FROM names WHERE length(name) % 3 = 0
        |), vocab AS (SELECT name FROM names UNION SELECT name FROM typos)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM vocab a JOIN vocab b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    "t_global_ids" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_global_ids_native" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_shuffle_hash" ->
      """WITH s AS (
        |  SELECT doc_id, md5(concat('shuf:', CAST(doc_id AS VARCHAR))) AS shuffle_key
        |  FROM documents ORDER BY shuffle_key LIMIT 100
        |)
        |SELECT doc_id, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key) AS INT) AS position
        |FROM s ORDER BY position""".stripMargin,
    "t_table_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |v1 AS (
        |  SELECT k, md5(concat(CAST(k AS VARCHAR), '|',
        |    CAST(CAST(round(p * 100) AS BIGINT) AS VARCHAR))) AS h1
        |  FROM o WHERE k % 11 <> 0
        |), v2 AS (
        |  SELECT k, md5(concat(CAST(k AS VARCHAR), '|',
        |    CAST(CAST(round(CASE WHEN k % 7 = 0 THEN p + 50 ELSE p END * 100) AS BIGINT) AS VARCHAR))) AS h2
        |  FROM o WHERE k % 13 <> 0
        |)
        |SELECT CASE WHEN v1.k IS NULL THEN 'added'
        |            WHEN v2.k IS NULL THEN 'removed'
        |            WHEN h1 = h2 THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |  count(*) AS n
        |FROM v1 FULL JOIN v2 ON v1.k = v2.k
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "t_salted_join" ->
      """WITH li AS (
        |  SELECT l_partkey % 20 AS k, l_quantity FROM lineitem
        |), ord AS (
        |  SELECT o_orderkey % 20 AS k2, round(sum(o_totalprice), 2) AS k_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT k, count(*) AS n, round(sum(l_quantity), 2) AS qty, max(k_total) AS k_total
        |FROM li JOIN ord ON k = k2
        |GROUP BY k ORDER BY k""".stripMargin,
    "t_skew_advisor" ->
      """WITH a AS (
        |  SELECT 'l_orderkey' AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'hot_bucket' AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  GROUP BY (CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE 1 + l_orderkey % 19 END)
        |), g AS (
        |  SELECT key, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(c) AS BIGINT) AS max_key_rows,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT) AS p99_key_rows
        |  FROM a GROUP BY key
        |)
        |SELECT key, n_rows, n_keys,
        |  (1000000 * n_rows) // n_keys AS mean_rows_micro,
        |  p99_key_rows, max_key_rows,
        |  (1000000 * max_key_rows * n_keys) // n_rows AS skew_factor_micro,
        |  greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows) AS recommended_salts,
        |  greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows) > 1 AS needs_salting
        |FROM g ORDER BY key""".stripMargin,
    "t_purged_folds" ->
      """WITH b AS (
        |  SELECT min(CAST(o_orderdate AS DATE)) AS dmin,
        |    max(CAST(o_orderdate AS DATE)) AS dmax,
        |    datediff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))) + 1 AS span
        |  FROM orders
        |), folds AS (
        |  SELECT CAST(i AS INT) AS fold, dmin,
        |    (i * span) // 5 AS ts, ((i + 1) * span) // 5 AS te
        |  FROM unnest(generate_series(0, 4)) AS u(i), b
        |), r AS (
        |  SELECT fold, CAST(o_orderdate AS DATE) AS d, o_totalprice,
        |    CASE
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= ts
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < te THEN '3_test'
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= ts - 7
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < ts THEN '2_purged'
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= te
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < te + 7 THEN '4_embargo'
        |      ELSE '1_train' END AS split
        |  FROM orders, folds
        |)
        |SELECT fold, split, count(*) AS n, min(d) AS min_d, max(d) AS max_d,
        |  round(sum(o_totalprice), 2) AS total
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // each FK replayed with the same negated-key injection; LEFT JOIN +
    // one aggregate mirrors the Spark side exactly
    "dq_fk" -> {
      def one(fk: String, childSel: String, inject: String,
              parent: String, pkey: String) =
        s"""SELECT '$fk' AS fk, cast(count(*) AS bigint) AS n_child,
           |  cast(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_orphan,
           |  (SELECT cast(count(*) AS bigint) FROM $parent) AS n_parent,
           |  cast(count(DISTINCT pk) AS bigint) AS n_ref_parent
           |FROM (SELECT k, $pkey AS pk FROM ($childSel
           |      UNION ALL $inject) c
           |      LEFT JOIN $parent ON c.k = $pkey) j""".stripMargin
      Seq(
        one("orders.o_custkey->customer",
          "SELECT o_custkey AS k FROM orders",
          "SELECT -(o_custkey+1) FROM orders WHERE o_orderkey % 1000 = 1",
          "customer", "c_custkey"),
        one("lineitem.l_orderkey->orders",
          "SELECT l_orderkey AS k FROM lineitem",
          "SELECT -(l_orderkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "orders", "o_orderkey"),
        one("lineitem.l_partkey->part",
          "SELECT l_partkey AS k FROM lineitem",
          "SELECT -(l_partkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "part", "p_partkey"),
        one("lineitem.l_suppkey->supplier",
          "SELECT l_suppkey AS k FROM lineitem",
          "SELECT -(l_suppkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "supplier", "s_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    },
    // the incremental four-term union must equal the from-scratch join
    "t_incr_join" ->
      """SELECT c_nationkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "t_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
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
    "t_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t_dedup_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // same contract diff replayed over DuckDB's DESCRIBE of the feed
    "dq_schema_contract" ->
      """WITH actual AS (
        |  SELECT column_name AS col,
        |    CASE column_type
        |      WHEN 'BIGINT' THEN 'bigint' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp'
        |      ELSE lower(column_type) END AS actual
        |  FROM (DESCRIBE SELECT * FROM orders)
        |), contract(col, expected) AS (
        |  VALUES ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
        |         ('o_orderstatus', 'string'), ('o_totalprice', 'decimal(12,2)'),
        |         ('o_orderdate', 'timestamp'), ('o_channel', 'string')
        |)
        |SELECT coalesce(c.col, a.col) AS "column", expected, actual,
        |  CASE WHEN expected IS NULL THEN 'unexpected'
        |       WHEN actual IS NULL THEN 'missing'
        |       WHEN expected = actual THEN 'ok'
        |       ELSE 'type_mismatch' END AS verdict
        |FROM contract c FULL OUTER JOIN actual a ON c.col = a.col
        |ORDER BY "column"""".stripMargin,
    // incremental maintenance must be indistinguishable from a full
    // rebuild — the oracle recomputes the rollup from all of orders
    "t_incr_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    // same oracle as t_dedup_key: the optimizer rule must not change
    // results, only the plan
    "t_dedup_key_rule" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // T37: z-scores from train-only moments; both splits scored on
    // the train scale (the leakage-safe scaler contract)
    "t_scale" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS v,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'test' ELSE 'train' END AS split
        |  FROM orders
        |), st AS (
        |  SELECT grp, count(*) AS n_tr,
        |    sum(CAST(v AS HUGEINT)) AS sv,
        |    sum(CAST(v AS HUGEINT) * v) AS svv
        |  FROM r WHERE split = 'train' GROUP BY grp
        |), mu AS (
        |  SELECT grp, CAST(sv AS DOUBLE) / n_tr AS mu,
        |    sqrt(CAST(n_tr * svv - sv * sv AS DOUBLE)) / n_tr AS sd
        |  FROM st
        |), z AS (
        |  SELECT r.grp, r.split,
        |    CASE WHEN sd = 0 THEN 0 ELSE
        |      CAST(round((CAST(v AS DOUBLE) - mu) / sd * 1e6) AS BIGINT)
        |    END AS zm
        |  FROM r JOIN mu ON r.grp = mu.grp
        |)
        |SELECT grp, split, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(zm) AS BIGINT) AS sum_z_micro,
        |  CAST(max(abs(zm)) AS BIGINT) AS max_abs_z_micro
        |FROM z GROUP BY 1, 2 ORDER BY grp, split""".stripMargin,
    // T35: bucket and sign fold the md5 hex via ascii arithmetic —
    // identical md5/ascii/substr on both engines, so the sparse
    // vectors replay bit-equal (the mm_integrity idiom)
    "t_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, md5(tok) AS m FROM toks WHERE tok <> ''
        |), b AS (
        |  SELECT doc_id,
        |    ((ascii(substr(m, 1, 1)) * 131 + ascii(substr(m, 2, 1))) * 131
        |      + ascii(substr(m, 3, 1))) * 131 + ascii(substr(m, 4, 1)) AS f,
        |    CASE WHEN ascii(substr(m, 5, 1)) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM h
        |)
        |SELECT doc_id, CAST(f % 64 AS BIGINT) AS bucket,
        |  CAST(sum(sgn) AS BIGINT) AS v
        |FROM b GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,
    // T36: probe sequence, anti-join and first-k selection replayed
    // with the same multiplicative-hash arithmetic (all terms
    // positive, so plain % ≡ pmod on both engines)
    "t_neg_sample" ->
      """WITH np AS (SELECT count(*) AS n FROM part),
        |pos AS (
        |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), cust AS (SELECT DISTINCT custkey FROM pos),
        |probes AS (
        |  SELECT c.custkey, t.j,
        |    ((c.custkey * 2654435761 + t.j * 40503) % 4294967296) % np.n + 1
        |      AS partkey
        |  FROM cust c, range(0, 12) t(j), np
        |), neg AS (
        |  SELECT p.custkey, p.partkey, min(p.j) AS jmin
        |  FROM probes p
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.custkey = p.custkey AND pos.partkey = p.partkey)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT custkey, partkey,
        |    row_number() OVER (PARTITION BY custkey ORDER BY jmin, partkey) AS rnk
        |  FROM neg
        |)
        |SELECT custkey, CAST(rnk AS BIGINT) AS rnk, partkey
        |FROM r WHERE rnk <= 4 ORDER BY custkey, rnk""".stripMargin,
    // ln is libm on both engines (may differ in the last ulp) but keys
    // are pico-rounded: a flip needs a value within ~1e-10 of a .5
    // boundary — not observed at these SFs, same convention as text_pmi.
    "t_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars AS w,
        |    ((CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 + 0.5)
        |      / 4294967296.0 AS u
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT doc_id, w,
        |  CAST(round(-ln(u) / w * 1e12) AS BIGINT) AS key_pico
        |FROM h
        |ORDER BY key_pico, doc_id LIMIT 100""".stripMargin,
    "t_impute" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS raw,
        |    (o_orderkey % 7 = 0) AS miss
        |  FROM orders
        |), obs AS (SELECT grp, raw FROM base WHERE NOT miss),
        |gmed AS (
        |  SELECT grp,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY raw) AS BIGINT) AS gmed
        |  FROM obs GROUP BY 1
        |), gl AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY raw) AS BIGINT) AS gl
        |  FROM obs
        |)
        |SELECT b.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN b.miss THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |  min(g.gmed) AS impute_micro,
        |  CAST(round(CAST(sum(CAST(CASE WHEN b.miss THEN coalesce(g.gmed, gl.gl)
        |    ELSE b.raw END AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT) AS mean_micro
        |FROM base b LEFT JOIN gmed g USING (grp), gl
        |GROUP BY b.grp ORDER BY b.grp""".stripMargin,
    // observe: the in-flight counters must equal a direct aggregate
    "dq_observe" ->
      """WITH g AS (
        |  SELECT count(*) AS observed_rows,
        |    CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS observed_null_price,
        |    CAST(coalesce(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)), 0)
        |      AS BIGINT) AS observed_sum_micro
        |  FROM orders
        |)
        |SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  g.observed_rows, g.observed_null_price, g.observed_sum_micro
        |FROM orders CROSS JOIN g
        |GROUP BY 1, g.observed_rows, g.observed_null_price, g.observed_sum_micro
        |ORDER BY month""".stripMargin,
    // FPE: the same keyed per-position digit shift on both engines
    "t_fpe" ->
      """SELECT c_custkey, acct,
        |  array_to_string(list_transform(generate_series(1, 10),
        |    j -> CAST((CAST(substr(acct, j, 1) AS INT) + (j*7 + 3) % 10) % 10 AS VARCHAR)),
        |    '') AS token
        |FROM (SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS acct
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    // point-in-time features: the strictly-before frame on both sides
    "t_feature_asof" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS spend_micro
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey,
        |  CAST(count(*) OVER f AS BIGINT) AS prior_orders,
        |  CAST(coalesce(sum(spend_micro) OVER f, 0) AS BIGINT) AS prior_spend_micro,
        |  CAST(datediff('day', lag(d) OVER w, d) AS INT) AS days_since_prev
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey),
        |  f AS (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,
    // T39: the KS argmax is exact cross-multiplied integers; only the
    // final per-source scalar divides (micro-rounded, IEEE-identical)
    "dq_ks_drift" ->
      """WITH vals AS (
        |  SELECT source, n_chars AS v FROM documents
        |), tot AS (
        |  SELECT source, count(*) AS ns FROM vals GROUP BY 1
        |), grand AS (
        |  SELECT count(*) AS n FROM vals
        |), grid AS (
        |  SELECT DISTINCT v FROM vals
        |), pv AS (
        |  SELECT source, v, count(*) AS c FROM vals GROUP BY 1, 2
        |), gv AS (
        |  SELECT v, count(*) AS g FROM vals GROUP BY 1
        |), ggrid AS (
        |  SELECT g1.v, sum(coalesce(gv.g, 0)) OVER (ORDER BY g1.v) AS gcs
        |  FROM grid g1 LEFT JOIN gv ON g1.v = gv.v
        |), cum AS (
        |  SELECT t.source, t.ns, g.v,
        |    sum(coalesce(pv.c, 0)) OVER (PARTITION BY t.source ORDER BY g.v) AS cs
        |  FROM tot t CROSS JOIN grid g
        |  LEFT JOIN pv ON pv.source = t.source AND pv.v = g.v
        |), d AS (
        |  SELECT c.source, c.ns, gr.n,
        |    abs(c.cs * (gr.n - c.ns) - (gg.gcs - c.cs) * c.ns) AS num
        |  FROM cum c JOIN ggrid gg ON c.v = gg.v CROSS JOIN grand gr
        |), m AS (
        |  SELECT source, min(ns) AS ns, min(n) AS n, max(num) AS mx
        |  FROM d GROUP BY source
        |)
        |SELECT source, CAST(ns AS BIGINT) AS n_src,
        |  CAST(round(CAST(mx AS DOUBLE) /
        |    (CAST(ns AS DOUBLE) * (n - ns)) * 1e6) AS BIGINT) AS ks_micro
        |FROM m WHERE ns < n ORDER BY source""".stripMargin,
    // T38: the hole rule and per-month counts replay from the raw
    // table; the landed flag derives from the planted i%7==3 drops
    "dq_completeness" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        |  FROM orders GROUP BY 1
        |), idx AS (
        |  SELECT month, n, row_number() OVER (ORDER BY month) - 1 AS i FROM m
        |), span AS (
        |  SELECT min(month) AS lo, max(month) AS hi FROM m
        |), exp AS (
        |  SELECT strftime(t.m, '%Y-%m') AS month FROM span,
        |    unnest(generate_series(CAST(lo || '-01' AS DATE),
        |      CAST(hi || '-01' AS DATE), INTERVAL 1 MONTH)) AS t(m)
        |)
        |SELECT e.month,
        |  coalesce(i.i % 7 <> 3, false) AS landed,
        |  CASE WHEN coalesce(i.i % 7 <> 3, false) THEN i.n ELSE 0 END AS n_rows
        |FROM exp e LEFT JOIN idx i USING (month) ORDER BY month""".stripMargin,
    // the pseudonym-space join must reproduce the raw-key rollup
    // exactly — DuckDB replays the same salted-hash surrogates
    "t_pseudonym" ->
      """WITH c AS (
        |  SELECT substr(md5('graft_s1' || CAST(c_custkey AS VARCHAR)), 1, 16) AS cust_sid,
        |         c_nationkey
        |  FROM customer
        |), o AS (
        |  SELECT substr(md5('graft_s1' || CAST(o_custkey AS VARCHAR)), 1, 16) AS cust_sid,
        |         o_totalprice
        |  FROM orders
        |)
        |SELECT c_nationkey,
        |  CAST(count(DISTINCT cust_sid) AS BIGINT) AS n_customers,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM c JOIN o USING (cust_sid)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "t_kanon" ->
      """WITH c AS (
        |  SELECT c_acctbal, n_name FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |), l0 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name, floor(c_acctbal/100))),
        |l1 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name, floor(c_acctbal/1000))),
        |l2 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name)),
        |lv AS (SELECT CASE WHEN (SELECT m FROM l0) >= 5 THEN 0
        |                   WHEN (SELECT m FROM l1) >= 5 THEN 1
        |                   WHEN (SELECT m FROM l2) >= 5 THEN 2
        |                   ELSE 3 END AS lvl)
        |SELECT CASE WHEN lvl >= 3 THEN 'ALL' ELSE n_name END AS geo,
        |  CASE lvl
        |    WHEN 0 THEN CAST(CAST(floor(c_acctbal/100) AS BIGINT) AS VARCHAR)
        |    WHEN 1 THEN CAST(CAST(floor(c_acctbal/1000) AS BIGINT) AS VARCHAR)
        |    ELSE 'ALL' END AS band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(lvl AS INT) AS level
        |FROM c CROSS JOIN lv
        |GROUP BY 1, 2, lvl ORDER BY geo, band""".stripMargin
  )
}
