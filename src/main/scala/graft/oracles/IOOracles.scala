package graft.oracles

/** DuckDB-dialect oracle SQL for the source/sink/pipeline operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object IOOracles {
  val sql: Map[String, String] = Map(
    "src_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
        |            ELSE 'PRE_EVOLUTION' END AS status,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "src_incremental" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_sorted" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 5000""".stripMargin,
    "src_fvecs" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vsum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "src_xml" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_json_multiline" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 20 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_jsonl_corrupt" ->
      """SELECT cast(sum(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END) AS bigint) AS n_good,
        |  cast(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS bigint) AS n_corrupt,
        |  round(sum(CASE WHEN o_orderkey % 7 <> 0 THEN o_totalprice END), 2) AS total_good
        |FROM orders""".stripMargin,
    // the oracle replays what SHOULD have happened at every stage of
    // the write-audit-publish protocol — publishing a failing batch or
    // drifting the visible version breaks the hash
    // K25: the oracle recomputes the expected FINAL state of both
    // tables from raw facts — a leaked half-transaction (the crashed
    // writer's full-data monthly files alongside v1's half-data
    // priority files) would break grand_n/grand_total on table A
    "sink_txn" ->
      """WITH t AS (
        |  SELECT CAST(round(o_totalprice * 1e6) AS BIGINT) AS micro,
        |    strftime(o_orderdate, '%Y-%m') AS m, o_orderpriority AS p
        |  FROM orders
        |), s AS (
        |  SELECT 'orders_by_priority' AS tbl,
        |    CAST(count(DISTINCT p) AS BIGINT) AS n_groups,
        |    CAST(count(*) AS BIGINT) AS grand_n,
        |    CAST(sum(micro) AS BIGINT) AS grand_total_micro
        |  FROM t
        |  UNION ALL
        |  SELECT 'orders_monthly',
        |    CAST(count(DISTINCT m) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(micro) AS BIGINT)
        |  FROM t
        |)
        |SELECT tbl, n_groups, grand_n, grand_total_micro,
        |  CAST(2 AS BIGINT) AS catalog_version, true AS consistent
        |FROM s ORDER BY tbl""".stripMargin,
    "sink_wap" ->
      """WITH n AS (SELECT cast(count(*) AS bigint) AS total FROM orders),
        |bad AS (SELECT cast(count(*) AS bigint) AS nb FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT '1_publish_clean' AS stage, total AS n_rows,
        |  cast(0 AS bigint) AS n_violations, true AS published,
        |  cast(1 AS bigint) AS current_version,
        |  total - nb AS live_rows FROM n, bad
        |UNION ALL
        |SELECT '2_reject_corrupt', total, nb, false, 1, total - nb FROM n, bad
        |UNION ALL
        |SELECT '3_publish_fixed', total - nb, 0, true, 2, total - nb FROM n, bad
        |ORDER BY stage""".stripMargin,
    // K41: CTAS = filtered projection totals, RTAS = the rollup's
    // shape (status count + grand order count through the new schema)
    "sink_ctas" ->
      """SELECT '1_ctas' AS step,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus <> 'P'
        |UNION ALL
        |SELECT '2_rtas',
        |  cast(count(DISTINCT o_orderstatus) AS bigint),
        |  cast(count(*) AS double)
        |FROM orders
        |ORDER BY step""".stripMargin,
    // K40: per-version row totals replayed from raw parquet — v1 =
    // even keys, v2 = all, v3 = post-DELETE survivors; the files row
    // re-asserts v3's live total through the other metadata relation
    "sink_meta_tables" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders)
        |SELECT 'history' AS src, cast(1 AS bigint) AS version,
        |  (SELECT cast(count(*) AS bigint) FROM o WHERE o_orderkey % 2 = 0) AS n_rows
        |UNION ALL
        |SELECT 'history', 2, (SELECT cast(count(*) AS bigint) FROM o)
        |UNION ALL
        |SELECT 'history', 3,
        |  (SELECT cast(count(*) AS bigint) FROM o WHERE o_orderstatus <> 'F')
        |UNION ALL
        |SELECT 'files', 3,
        |  (SELECT cast(count(*) AS bigint) FROM o WHERE o_orderstatus <> 'F')
        |ORDER BY src, version""".stripMargin,
    // K39: MoR replay — v1 = full load (time travel), v3 = post-DML
    // masked read (deletes applied, updates visible), x_protocol =
    // manifest actuals (delete-file key count; carried flag 1.0 = no
    // data file was rewritten by either DML)
    "sink_catalog_mor" ->
      """WITH src AS (SELECT o_orderkey, o_totalprice FROM orders),
        |keep AS (
        |  SELECT o_totalprice
        |    + CASE WHEN o_orderkey % 5 = 0 THEN 1000.0 ELSE 0 END AS p
        |  FROM src WHERE o_orderkey % 7 <> 0
        |), dk AS (
        |  SELECT cast((SELECT count(*) FROM src WHERE o_orderkey % 7 = 0)
        |    + (SELECT count(*) FROM src
        |       WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0) AS bigint) AS n
        |)
        |SELECT 'v1_full' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total FROM src
        |UNION ALL
        |SELECT 'v3_mor', cast(count(*) AS bigint), round(sum(p), 2) FROM keep
        |UNION ALL
        |SELECT 'x_protocol', n, 1.0 FROM dk
        |ORDER BY snapshot""".stripMargin,
    // K47: default-drift replay — 'old' = pre-ADD existence rows +
    // omitted inserts under the first current default; 'new' = omitted
    // inserts after SET DEFAULT; protocol = zero NULL segs + carried
    "sink_catalog_set_default" ->
      """WITH src AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders)
        |SELECT 'old' AS seg, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM src WHERE k % 2 = 0 OR k % 4 = 1
        |UNION ALL
        |SELECT 'new', cast(count(*) AS bigint), round(sum(p), 2)
        |FROM src WHERE k % 4 = 3
        |UNION ALL
        |SELECT 'x_protocol', cast(0 AS bigint), 1.0
        |ORDER BY seg""".stripMargin,
    // K46: write-distribution replay — per-status totals from orders;
    // protocol = exactly 8 files, one per bucket dir (expected flag
    // 1.0: a write that fanned out per source task breaks the hash)
    "sink_catalog_bucketed_dist" ->
      """SELECT o_orderstatus, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'x_protocol', cast(8 AS bigint), 1.0
        |ORDER BY o_orderstatus""".stripMargin,
    // K45: zorder replay — box and full aggregates from the same
    // derivation; protocol = 4 fragments rewritten + the pruning flag
    // (expected 1.0: the box scan must touch < half the files)
    "sink_catalog_zorder" ->
      """WITH src AS (
        |  SELECT o_custkey % 256 AS xk,
        |    cast(floor(o_totalprice / 1000.0) AS bigint) AS yb,
        |    o_totalprice AS p
        |  FROM orders
        |)
        |SELECT '1_box' AS step, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM src WHERE xk BETWEEN 32 AND 63 AND yb BETWEEN 64 AND 127
        |UNION ALL
        |SELECT '2_full', cast(count(*) AS bigint), round(sum(p), 2) FROM src
        |UNION ALL
        |SELECT '3_protocol', cast(4 AS bigint), 1.0
        |ORDER BY step""".stripMargin,
    // K44: default-value replay — 'std' = pre-ADD rows (existence
    // default projected over untouched v1 files) + omitted-column
    // inserts (current default materialized); 'vip' = explicit values;
    // protocol = zero NULL segments + the carried (metadata-only) flag
    "sink_catalog_default" ->
      """WITH src AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders)
        |SELECT 'std' AS segment, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM src WHERE k % 2 = 0 OR k % 3 <> 0
        |UNION ALL
        |SELECT 'vip', cast(count(*) AS bigint), round(sum(p), 2)
        |FROM src WHERE k % 2 <> 0 AND k % 3 = 0
        |UNION ALL
        |SELECT 'x_protocol', cast(0 AS bigint), 1.0
        |ORDER BY segment""".stripMargin,
    // K43: partitions-rollup replay — row totals through the rollup at
    // the v2 pin (everything inserted) and latest (post-DELETE); the
    // layout/truncation laws ride the ok flags (expected 1.0), the
    // pinned history row count is 2 by construction
    "sink_meta_partitions" ->
      """SELECT '1_v2_rollup' AS step,
        |  (SELECT cast(count(*) AS bigint) FROM orders) AS n, 1.0 AS ok
        |UNION ALL
        |SELECT '2_v3_rollup',
        |  (SELECT cast(count(*) AS bigint) FROM orders WHERE o_orderstatus <> 'F'),
        |  1.0
        |UNION ALL
        |SELECT '3_history_pin', cast(2 AS bigint), 1.0
        |ORDER BY step""".stripMargin,
    // K49: manifest-stats replay — the dim join's aggregates from raw
    // parquet; the protocol row pins the reported numRows ACTUAL (25 —
    // nation is fixed-size at every SF) and the static-broadcast flag
    // (expected 1.0: a stats regression un-broadcasts the static plan
    // and hash-mismatches here)
    "sink_catalog_stats" ->
      """SELECT n_name AS tag, cast(count(*) AS bigint) AS n,
        |  round(sum(c_acctbal), 2) AS total
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name
        |UNION ALL
        |SELECT '__stats_protocol', cast(25 AS bigint), 1.0
        |ORDER BY tag""".stripMargin,
    // K51: multi-statement-transaction replay — the net effect of the
    // three statements (full set, F rows deleted, +1000 on every 5th
    // key) grouped by status; the protocol row pins the commit version
    // ACTUAL (2 — three statements, ONE version boundary) and the
    // isolation/workspace-drop flag (expected 1.0)
    "sink_catalog_txn_multi" ->
      """WITH net AS (
        |  SELECT o_orderstatus,
        |    o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1000.0 ELSE 0 END AS p
        |  FROM orders WHERE o_orderstatus <> 'F'
        |)
        |SELECT o_orderstatus AS status, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM net GROUP BY o_orderstatus
        |UNION ALL
        |SELECT '__txn_protocol', cast(2 AS bigint), 1.0
        |ORDER BY status""".stripMargin,
    // K52: group-transaction replay — flat table = even keys + the
    // txn's odd-'O' insert + the racer row (txn 2's wipes must NOT
    // appear: the group abort discards both workspaces); bucketed
    // table = odd keys minus %10=5 with +1000 on %10=1; the protocol
    // row pins the group commit version (2 on both tables, one journal
    // point) and the isolation/atomicity/conflict flags (expected 1.0)
    "sink_catalog_txn_group" ->
      """WITH flat AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 1 AND o_orderstatus = 'O'
        |  UNION ALL SELECT -1, 'RACER', 0.0
        |), buck AS (
        |  SELECT o_orderkey,
        |    o_totalprice + CASE WHEN o_orderkey % 10 = 1 THEN 1000.0 ELSE 0 END AS p
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 10 <> 5
        |)
        |SELECT o_orderstatus AS status, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM flat GROUP BY o_orderstatus
        |UNION ALL
        |SELECT '__bucketed', cast(count(*) AS bigint), round(sum(p), 2)
        |FROM buck
        |UNION ALL
        |SELECT '__txn_protocol', cast(2 AS bigint), 1.0
        |ORDER BY status""".stripMargin,
    // K60: MoR-transaction replay — v2 (every 7th key equality-
    // deleted) + the txn's three statements (reinsert deleted 'O'
    // rows; delete every 5th key INCLUDING the fresh reinserts — the
    // intra-txn delete-after-insert law a squash would break; +1000
    // on every 11th survivor) + the racer row; the
    // '__stmt_granularity' row pins the VERSION AS OF 3 masked count
    // (statement-granular time travel) and '__txn_protocol' the final
    // version (5) with the isolation/carry/conflict flag
    "sink_catalog_txn_mor" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 7 <> 0
        |), after1 AS (
        |  SELECT * FROM v2
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 7 = 0 AND o_orderstatus = 'O'
        |), after2 AS (
        |  SELECT * FROM after1 WHERE o_orderkey % 5 <> 0
        |), final AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    o_totalprice + CASE WHEN o_orderkey % 11 = 0 THEN 1000.0
        |      ELSE 0 END AS p
        |  FROM after2
        |  UNION ALL SELECT -1, 'RACER', 0.0
        |)
        |SELECT o_orderstatus AS status, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM final GROUP BY o_orderstatus
        |UNION ALL
        |SELECT '__stmt_granularity',
        |  (SELECT cast(count(*) AS bigint) FROM after1), 1.0
        |UNION ALL
        |SELECT '__txn_protocol', cast(5 AS bigint), 1.0
        |ORDER BY status""".stripMargin,
    // K61: spec-evolved-transaction replay — the full table (evens
    // spec-0 + odds spec-new) + the txn's statements (synthetic 'P'
    // rows at negated keys, then +1000 on every negative key); the
    // protocol row pins the commit version (3 — one boundary) and the
    // isolation/spec-preservation flag (expected 1.0: carried files
    // keep {0, new}, fresh files stamp new — computed from the
    // manifests where the oracle cannot reach)
    "sink_catalog_txn_evolve" ->
      """WITH fin AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice AS p FROM orders
        |  UNION ALL
        |  SELECT -o_orderkey, 'P', o_totalprice + 1000.0 FROM orders
        |  WHERE o_orderkey % 10 = 3
        |)
        |SELECT o_orderstatus AS status, cast(count(*) AS bigint) AS n,
        |  round(sum(p), 2) AS total
        |FROM fin GROUP BY o_orderstatus
        |UNION ALL
        |SELECT '__txn_protocol', cast(3 AS bigint), 1.0
        |ORDER BY status""".stripMargin,
    // K53: CBO-stats replay — the 3-way join rollup over the derived
    // fact/dim tables (every fact row matches exactly one key in each
    // dim); the protocol row pins the join count (3 relations) and the
    // reorder flag (expected 1.0: the NDV-fed CBO pulls the 10-key dim
    // ahead of the 1000-key dim while the stats-off plan follows the
    // written order)
    "sink_catalog_cbo" ->
      """WITH f AS (
        |  SELECT l_orderkey % 1000 AS k1, l_orderkey % 500 AS k2,
        |    l_quantity AS q
        |  FROM lineitem
        |)
        |SELECT concat('b', k2) AS grp, cast(count(*) AS bigint) AS n,
        |  round(sum(q), 2) AS total
        |FROM f WHERE k2 < 10 GROUP BY k2
        |UNION ALL
        |SELECT '__cbo_protocol', cast(3 AS bigint), 1.0
        |ORDER BY grp""".stripMargin,
    // K54: scoped-ZORDER replay — content is invariant under the
    // rewrite (per-region rollup straight from lineitem); the protocol
    // row pins the region count and the carried-file-identity flag
    // (expected 1.0: every out-of-scope file kept its NAME, every
    // in-scope file was replaced — computed from the manifests on the
    // Spark side, where the oracle cannot reach)
    "sink_zorder_scoped" ->
      """WITH f AS (
        |  SELECT l_orderkey % 4 AS r, l_quantity AS q FROM lineitem
        |)
        |SELECT cast(r AS varchar) AS grp, cast(count(*) AS bigint) AS n,
        |  round(sum(q), 2) AS total
        |FROM f GROUP BY r
        |UNION ALL
        |SELECT '__scoped_protocol', cast(4 AS bigint), 1.0
        |ORDER BY grp""".stripMargin,
    // K55: branch/tag-SQL replay — the per-status rollup through the
    // fast-forwarded 'main' branch equals the full corrected load; the
    // release-tag row pins the immutable v1 count; the protocol row
    // pins the head version (4: clean, corrupt, delete, fix) and the
    // isolation/audit flags (expected 1.0)
    "sink_branch_sql" ->
      """SELECT o_orderstatus AS status, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT '__release_tag',
        |  (SELECT cast(count(*) AS bigint) FROM orders
        |   WHERE o_orderstatus <> 'F'), 1.0
        |UNION ALL
        |SELECT '__ref_protocol', cast(4 AS bigint), 1.0
        |ORDER BY status""".stripMargin,
    // K56: metadata-delete replay — the post-DELETE per-day rollup
    // (days 0..2 gone); the protocol row pins the insert count and the
    // manifest-law flag (expected 1.0: interior files vanished with no
    // replacement, out-of-range files carried by name, only the
    // boundary rewrote — computed from the manifests on the Spark side)
    "sink_delete_metadata" ->
      """WITH t AS (
        |  SELECT (2 * (o_orderkey % 4)) + ((o_orderkey // 4) % 2) AS day,
        |    o_totalprice AS v
        |  FROM orders
        |)
        |SELECT cast(day AS varchar) AS grp, cast(count(*) AS bigint) AS n,
        |  round(sum(v), 2) AS total
        |FROM t WHERE day > 2 GROUP BY day
        |UNION ALL
        |SELECT '__meta_delete_protocol', cast(4 AS bigint), 1.0
        |ORDER BY grp""".stripMargin,
    // K57: histogram replay — the tail rollup (x > 900, only the
    // spread 10% reaches there) straight from lineitem; the protocol
    // row pins the bin count and the estimator flag (expected 1.0:
    // the CBO estimate for x > 500 lands within 3x of the actual and
    // at least 3x below the uniform interpolation — computed on the
    // Spark side where the oracle cannot reach)
    "sink_catalog_histogram" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_orderkey % 10 = 0 THEN l_orderkey % 1000
        |    ELSE 5 END AS x, l_quantity AS q
        |  FROM lineitem
        |)
        |SELECT cast(x AS varchar) AS grp, cast(count(*) AS bigint) AS n,
        |  round(sum(q), 2) AS total
        |FROM t WHERE x > 900 GROUP BY x
        |UNION ALL
        |SELECT '__histogram_protocol', cast(32 AS bigint), 1.0
        |ORDER BY grp""".stripMargin,
    // K58: delete-mass-adjusted-stats replay — the fact⋈dim rollup
    // over the surviving (odd-key) half of customer; the protocol row
    // pins the scan's reported numRows ACTUAL (must equal the masked
    // count exactly — the delete-key subtraction law) and the static-
    // broadcast-under-pinned-threshold flag (expected 1.0: an
    // unadjusted size report exceeds the threshold and un-broadcasts)
    "sink_catalog_stats_mor" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 2 <> 0
        |)
        |SELECT cast(c_nationkey AS varchar) AS grp,
        |  cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
        |GROUP BY c_nationkey
        |UNION ALL
        |SELECT '__morstats_protocol',
        |  (SELECT cast(count(*) AS bigint) FROM customer
        |   WHERE c_custkey % 2 <> 0), 1.0
        |ORDER BY grp""".stripMargin,
    // K59: date-histogram replay — the December tail rollup (only the
    // spread 10% reaches past Nov 30) straight from lineitem; the
    // protocol row pins the bin count and the estimator flag (expected
    // 1.0: the CBO estimate for d > midyear lands within 3x of the
    // actual and at least 3x below uniform — computed on the Spark
    // side where the oracle cannot reach)
    "sink_catalog_histogram_date" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_orderkey % 10 = 0
        |    THEN DATE '2024-01-01' + CAST(l_orderkey % 365 AS INTEGER)
        |    ELSE DATE '2024-01-05' END AS d, l_quantity AS q
        |  FROM lineitem
        |)
        |SELECT cast(d AS varchar) AS grp, cast(count(*) AS bigint) AS n,
        |  round(sum(q), 2) AS total
        |FROM t WHERE d > DATE '2024-11-30' GROUP BY d
        |UNION ALL
        |SELECT '__histogram_date_protocol', cast(32 AS bigint), 1.0
        |ORDER BY grp""".stripMargin,
    // K50: bucket-evolution replay — the same full-table aggregate
    // before (mixed specs, flat scan) and after (converged, key-grouped
    // scan) the OPTIMIZE rewrite; the protocol row pins the new spec id
    // (1 — one evolution from the creation spec) and the plan/manifest
    // actuals flag (expected 1.0: a wrong scan class or a stale spec
    // tag hash-mismatches here)
    "sink_catalog_bucket_evolve" ->
      """WITH src AS (SELECT o_orderkey, o_totalprice FROM orders)
        |SELECT '1_mixed' AS step, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total FROM src
        |UNION ALL
        |SELECT '2_converged', cast(count(*) AS bigint),
        |  round(sum(o_totalprice), 2) FROM src
        |UNION ALL
        |SELECT '3_protocol', cast(1 AS bigint), 1.0
        |ORDER BY step""".stripMargin,
    // K48: partitions-history replay — per-version row mass through
    // the sweep (v1 = even keys, v2 = all, v3 = post-DELETE); the
    // shape/pin/monotonicity laws ride the ok flags (expected 1.0)
    "sink_meta_partitions_history" ->
      """SELECT '1_v1' AS step,
        |  (SELECT cast(count(*) AS bigint) FROM orders
        |   WHERE o_orderkey % 2 = 0) AS n, 1.0 AS ok
        |UNION ALL
        |SELECT '2_v2', (SELECT cast(count(*) AS bigint) FROM orders), 1.0
        |UNION ALL
        |SELECT '3_v3',
        |  (SELECT cast(count(*) AS bigint) FROM orders
        |   WHERE o_orderstatus <> 'F'), 1.0
        |ORDER BY step""".stripMargin,
    // K42: positional-MoR replay — same keep-set arithmetic as K39
    // (the two modes must agree on DATA); the protocol rows pin the
    // manifest actuals (delete-vector rows, carried flag) and the
    // COLUMNAR flag the Spark side reads from its own executed plan —
    // expected 1.0: a masked read that fell back to row-based scans
    // hash-mismatches here
    "sink_catalog_mor_pos" ->
      """WITH src AS (SELECT o_orderkey, o_totalprice FROM orders),
        |keep AS (
        |  SELECT o_totalprice
        |    + CASE WHEN o_orderkey % 5 = 0 THEN 1000.0 ELSE 0 END AS p
        |  FROM src WHERE o_orderkey % 7 <> 0
        |), dk AS (
        |  SELECT cast((SELECT count(*) FROM src WHERE o_orderkey % 7 = 0)
        |    + (SELECT count(*) FROM src
        |       WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0) AS bigint) AS n
        |)
        |SELECT 'v1_full' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total FROM src
        |UNION ALL
        |SELECT 'v3_mor', cast(count(*) AS bigint), round(sum(p), 2) FROM keep
        |UNION ALL
        |SELECT 'x_protocol', n, 1.0 FROM dk
        |UNION ALL
        |SELECT 'y_columnar', cast(2 AS bigint), 1.0
        |ORDER BY snapshot""".stripMargin,
    // K38: arithmetic replay of the branch/tag protocol outcomes —
    // branch isolation, rollback invisibility, fast-forward identity,
    // tag pinning; versions are deterministic (v1 full, v2 candidate,
    // v3 fixed) because the flow is single-writer
    "sink_branch" ->
      """WITH n AS (SELECT cast(count(*) AS bigint) AS total FROM orders),
        |bad AS (SELECT cast(count(*) AS bigint) AS nb FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT '1_create_main' AS step, 'main' AS ref_name, 'branch' AS kind,
        |  cast(1 AS bigint) AS at_version, cast(0 AS bigint) AS n_bad,
        |  total AS ref_rows, total AS main_rows FROM n, bad
        |UNION ALL
        |SELECT '2_tag_release', 'release', 'tag', 1, 0, total, total FROM n, bad
        |UNION ALL
        |SELECT '3_create_branch', 'audit', 'branch', 1, 0, total, total FROM n, bad
        |UNION ALL
        |SELECT '4_reject_candidate', 'audit', 'branch', 1, nb, total, total FROM n, bad
        |UNION ALL
        |SELECT '5_publish_main', 'main', 'branch', 3, 0, total - nb, total - nb FROM n, bad
        |UNION ALL
        |SELECT '6_tag_pinned', 'release', 'tag', 1, 0, total, total - nb FROM n, bad
        |ORDER BY step""".stripMargin,
    // the incrementally-rebuilt table must equal a from-scratch build
    // of the MODIFIED source (stale or doubled partitions break this)
    "p_dirty_partitions" ->
      """WITH b AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    CASE WHEN strftime(o_orderdate, '%Y-%m') = '1996-03'
        |         THEN o_totalprice + 100 ELSE o_totalprice END AS p
        |  FROM orders
        |)
        |SELECT month, cast(count(*) AS bigint) AS n, round(sum(p), 2) AS total
        |FROM b GROUP BY 1 ORDER BY month""".stripMargin,
    // the log lines are rendered from events with this exact
    // arithmetic; a hash match proves the text round-trip parsed every
    // field exactly
    "src_logs" ->
      """SELECT '/t/' || event_type AS path,
        |  cast(200 + CASE WHEN event_id % 20 = 0 THEN 204 ELSE 0 END AS int) AS status,
        |  cast(count(*) AS bigint) AS n,
        |  cast(sum(event_id % 997) AS bigint) AS total_bytes,
        |  cast(min(epoch_us(ts) // 1000000) AS bigint) AS min_ts_s,
        |  cast(max(epoch_us(ts) // 1000000) AS bigint) AS max_ts_s
        |FROM events GROUP BY 1, 2 ORDER BY path, status""".stripMargin,
    "sink_versioned" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1998-01-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // K24: the pinned v1 TVF read must equal pre-1998 history; the
    // un-pinned read must equal the full table (v2 = v1 + appends)
    "sink_time_travel" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1998-01-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // K29: the pinned v1 catalog read must equal the first INSERT's
    // batch exactly; the latest read must equal both batches
    "sink_catalog_sql" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1997-07-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // K30: v1 must equal the full load; v2 must equal the survivors of
    // the exact DELETE predicate (null semantics included)
    "sink_catalog_delete" ->
      """SELECT 'v1_pre_delete' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |UNION ALL
        |SELECT 'v2_post_delete', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 150000.0)
        |ORDER BY snapshot""".stripMargin,
    // K31: pre-evolution rows must bucket under the null fill, and
    // post-evolution rows must carry their real status
    "sink_catalog_evolve" ->
      """SELECT CASE WHEN o_orderdate < '1997-01-01' THEN '_legacy'
        |  ELSE o_orderstatus END AS status_bucket,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY 1 ORDER BY status_bucket""".stripMargin,
    // MERGE replay: matched+('F'-source) deleted, matched updated with
    // the summed price (target status kept), unmatched target carried,
    // unmatched source inserted — v1 is the pre-merge base verbatim
    "sink_catalog_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 4 < 3
        |), src AS (
        |  SELECT o_orderkey, o_orderstatus || 'S' AS o_orderstatus,
        |    o_totalprice / 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 4 >= 2
        |), merged AS (
        |  SELECT t.o_orderkey, t.o_orderstatus,
        |    CASE WHEN s.o_orderkey IS NOT NULL
        |      THEN t.o_totalprice + s.o_totalprice ELSE t.o_totalprice
        |    END AS o_totalprice
        |  FROM base t LEFT JOIN src s USING (o_orderkey)
        |  WHERE NOT (s.o_orderkey IS NOT NULL AND s.o_orderstatus = 'FS')
        |  UNION ALL
        |  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice
        |  FROM src s LEFT JOIN base t USING (o_orderkey)
        |  WHERE t.o_orderkey IS NULL
        |)
        |SELECT 'v1_pre_merge' AS snapshot, o_orderstatus,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM base GROUP BY 1, 2
        |UNION ALL
        |SELECT 'v2_post_merge', o_orderstatus,
        |  cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM merged GROUP BY 1, 2
        |ORDER BY snapshot, o_orderstatus""".stripMargin,
    "sink_catalog_bucketed" ->
      """SELECT c_mktsegment, cast(count(*) AS bigint) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "sink_catalog_prune" ->
      """SELECT 'date_band' AS q, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderdate BETWEEN DATE '1996-03-01' AND DATE '1996-09-30'
        |UNION ALL
        |SELECT 'key_band', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 2000
        |UNION ALL
        |SELECT 'no_prune_mod', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders WHERE o_orderkey % 7 = 3
        |ORDER BY q""".stripMargin,
    "sink_catalog_ts_travel" ->
      """SELECT 'v1_as_of_commit_ts' AS snapshot,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < DATE '1997-01-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // maintenance moves metadata and file layout, never data: the
    // post-optimize+vacuum table must aggregate the raw rows exactly
    "sink_catalog_call" ->
      """SELECT 'post_maintenance' AS snapshot,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total,
        |  cast(count(DISTINCT o_orderkey) AS bigint) AS n_keys
        |FROM orders""".stripMargin,
    "sink_catalog_update" ->
      """SELECT 'v1_pre_update' AS snapshot, o_orderstatus,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2
        |UNION ALL
        |SELECT 'v2_post_update', o_orderstatus, cast(count(*) AS bigint),
        |  round(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN o_totalprice / 2 ELSE o_totalprice END), 2)
        |FROM orders GROUP BY 1, 2
        |ORDER BY snapshot, o_orderstatus""".stripMargin,
    // concurrent branches must produce exactly the sequential results
    "p_parallel" ->
      """SELECT 'events' AS branch,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM events
        |UNION ALL SELECT 'lineitem',
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'orders',
        |  CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |ORDER BY branch""".stripMargin,
    // the manifest-pruned read must return exactly the raw-table range
    // query; `pruned` asserts files were actually skipped
    "sink_manifest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  true AS pruned
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000""".stripMargin,
    // Sources: the oracle aggregates the ORIGINAL parquet — a match
    // proves the write→read round-trip through the format was lossless.
    "src_parquet" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag <> 'N'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_url" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "src_csv" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_json" ->
      // CAST to DATE on the oracle side too: o_orderdate has shipped as
      // both DATE and TIMESTAMP(MICROS) parquet across testdata
      // generations, and the Spark side normalizes to DATE after the
      // JSON round-trip — both casts truncate, so they agree under
      // either encoding
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  max(CAST(o_orderdate AS DATE)) AS last_date
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
    "sink_jdbc" ->
      """SELECT * FROM (
        |  SELECT '1_replace' AS step, count(*) AS n_rows, true AS ok FROM nation
        |  UNION ALL SELECT '2_append', 2 * count(*), true FROM nation
        |  UNION ALL SELECT '3_fail', 2 * count(*), true FROM nation
        |  UNION ALL SELECT '4_replace_again', count(*), true FROM nation
        |) ORDER BY step""".stripMargin,
    "sink_compress" ->
      """SELECT * FROM (
        |  SELECT 'gzip' AS codec, count(*) AS n, round(sum(l_extendedprice), 2) AS total FROM lineitem
        |  UNION ALL SELECT 'snappy', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |  UNION ALL SELECT 'zstd', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |) ORDER BY codec""".stripMargin,
    "sink_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sink_csv" ->
      """SELECT cast(ts AS date) AS d, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sink_partitioned" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // CDC apply replayed as arithmetic: 0 mod 4 untouched, 1 mod 4
    // updated (+1000), 2 mod 4 deleted (update@seq1 superseded by
    // delete@seq3), 3 mod 4 inserted (+500)
    "sink_merge" ->
      """WITH fin AS (
        |  SELECT o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 1000
        |  FROM orders WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 500
        |  FROM orders WHERE o_orderkey % 4 = 3
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM fin GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "sink_warehouse" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice
        |                 ELSE o_totalprice + 1000 END), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // targeted erasure: the surviving table is everything outside the
    // doomed custkey range; `pruned` asserts files were carried forward
    "sink_delete" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS pruned
        |FROM orders WHERE o_custkey < 100 OR o_custkey > 120""".stripMargin,
    // bloom point lookup: min/max orderkey probes against the raw
    // table; `pruned` asserts the bloom manifest skipped files
    "sink_bloom_index" ->
      """WITH p AS (
        |  SELECT min(o_orderkey) AS k FROM orders
        |  UNION SELECT max(o_orderkey) FROM orders
        |)
        |SELECT o_orderkey, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total, true AS pruned
        |FROM orders WHERE o_orderkey IN (SELECT k FROM p)
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // quoted CSV: the oracle rebuilds the identical note (chr(10)
    // newline, literal quotes) straight from parquet — a hash match
    // proves the CSV round-trip was byte-exact on every row
    "src_csv_quoted" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  md5('order "' || CAST(o_orderkey AS VARCHAR) ||
        |      '", priority, line1' || chr(10) ||
        |      'line2 for cust ' || CAST(o_custkey AS VARCHAR)) AS note_md5,
        |  CAST(length('order "' || CAST(o_orderkey AS VARCHAR) ||
        |      '", priority, line1' || chr(10) ||
        |      'line2 for cust ' || CAST(o_custkey AS VARCHAR)) AS BIGINT) AS note_len
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sink_orc" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sink_compact" ->
      """SELECT '1_fragmented' AS step, CAST(64 AS BIGINT) AS n, true AS ok
        |UNION ALL
        |SELECT '2_compacted', 4, true
        |UNION ALL
        |SELECT '3_rows_kept', (SELECT count(*) FROM events), true
        |ORDER BY step""".stripMargin,
    // gzip JSONL: oracle aggregates the same fields from parquet —
    // a match proves the compressed round-trip field-exact
    "src_jsonl_gz" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,
    // fixed-width: oracle projects the fields straight from parquet —
    // hash match proves the render→parse cycle field-exact
    "src_fixed_width" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(o_totalprice * 1e6) AS BIGINT) AS price_micro,
        |  CAST(o_orderdate AS DATE) AS d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // vacuum: the oracle checks the survivors; which files died is
    // spec-pinned (exactly the unreferenced set)
    "sink_vacuum" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS vacuumed
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_cdf" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        |  WHERE strftime(o_orderdate, '%Y-%m') < '1997-01'
        |), v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 1 THEN round(p + 100.0, 2) ELSE p END AS p
        |  FROM v1 WHERE k % 5 <> 2
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |), j AS (
        |  SELECT coalesce(v1.k, v2.k) AS o_orderkey, v1.p AS pre_price, v2.p AS post_price
        |  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |)
        |SELECT CASE WHEN post_price IS NULL THEN 'delete'
        |         WHEN pre_price IS NULL THEN 'insert'
        |         ELSE 'update' END AS "_change_type",
        |  o_orderkey, pre_price, post_price
        |FROM j
        |WHERE post_price IS NULL OR pre_price IS NULL OR pre_price <> post_price
        |ORDER BY 1, o_orderkey""".stripMargin,
    "sink_clone" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  (SELECT count(*) FROM orders WHERE strftime(o_orderdate, '%Y-%m') < '1997-01')
        |    AS source_rows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // K28: the straddling query's answer must equal the raw table's —
    // both layouts pruned from the manifest, old files' priority
    // filter applied as a residual row predicate
    "sink_part_evolve" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS pruned, CAST(2 AS BIGINT) AS n_specs
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') >= '1996-10'
        |  AND strftime(o_orderdate, '%Y-%m') <= '1997-03'
        |  AND o_orderpriority = '1-URGENT'""".stripMargin,
    // K26: a restored table must be indistinguishable from never
    // having lost data; the metadata-only mechanics are spec-pinned
    "sink_restore" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  CAST(1 AS BIGINT) AS restored_from_version,
        |  CAST(3 AS BIGINT) AS current_version
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // K27: post-purge table ≡ source projected without the dropped
    // column; zero-write drop + bounded rewrite set are spec-pinned
    "sink_drop_column" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS purged, CAST(4 AS BIGINT) AS current_version
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_optimize" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS optimized
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_dyn_overwrite" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n,
        |  round(sum(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1997-03'
        |    THEN round(o_totalprice + 10.0, 2) ELSE o_totalprice END), 2) AS total,
        |  strftime(o_orderdate, '%Y-%m') = '1997-03' AS corrected
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // evolution replayed from the raw table: batch-1 months carry a
    // NULL channel (the column predates them), batch-2 months derive it
    "sink_schema_evolve" ->
      """WITH u AS (
        |  SELECT o_totalprice,
        |    CASE WHEN strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |      THEN (CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END)
        |    END AS channel
        |  FROM orders
        |)
        |SELECT coalesce(channel, 'pre_evolution') AS channel,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS evolved
        |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,
    // TTL: the oracle sees the surviving aggregate; the by-reference
    // carry (no rewrite) is spec-pinned where the oracle can't reach
    "sink_ttl" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS pruned
        |FROM orders WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DAG: waves are a pure function of the declared edges
    "p_dag" ->
      """SELECT 'scan' AS task, 1 AS wave, (SELECT count(*) FROM lineitem) AS value
        |UNION ALL SELECT 'orders_agg', 2, (SELECT count(*) FROM orders)
        |UNION ALL SELECT 'customer_agg', 2, (SELECT count(*) FROM customer)
        |UNION ALL SELECT 'report', 3,
        |  (SELECT count(*) FROM orders) + (SELECT count(*) FROM customer)
        |ORDER BY wave, task""".stripMargin,
    "p_backfill" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_flow_e2e" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  'this is an artificial transformation just to practice prefect' AS note
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p_flow_cache" ->
      """WITH m AS (
        |  SELECT month(o_orderdate) AS mo, cast(count(*) AS bigint) AS n,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1
        |)
        |SELECT 1 AS call_idx, 1 AS month, n, total, 1 AS body_runs FROM m WHERE mo = 1
        |UNION ALL
        |SELECT 2 AS call_idx, 2 AS month, n, total, 2 AS body_runs FROM m WHERE mo = 2
        |UNION ALL
        |SELECT 3 AS call_idx, 1 AS month, n, total, 2 AS body_runs FROM m WHERE mo = 1
        |ORDER BY call_idx""".stripMargin,
    "p_corpus_e2e" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, source,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks, toks, h
        |  FROM t WHERE len(toks) BETWEEN 20 AND 1000
        |), ke AS (
        |  SELECT min(doc_id) AS doc_id FROM q GROUP BY h
        |), qe AS (
        |  SELECT q.* FROM q JOIN ke USING (doc_id)
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM qe WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |), fin AS (
        |  SELECT * FROM qe
        |  WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id != cluster_id)
        |)
        |SELECT source, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(CAST(floor((n_toks - 1) / 48) AS BIGINT) + 1) AS bigint) AS n_chunks,
        |  cast(sum(n_toks) AS bigint) AS n_tokens
        |FROM fin GROUP BY 1 ORDER BY source""".stripMargin
  )
}
