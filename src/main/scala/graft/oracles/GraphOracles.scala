package graft.oracles

/** DuckDB-dialect oracle SQL for the graph-analytics operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object GraphOracles {
  val sql: Map[String, String] = Map(
    // G1: 5 PageRank iterations unrolled as CTE stages — every double
    // of the textbook formulation replaced by exact integer micro ops
    // (r' = 150000 + (85·Σ(r div deg)) div 100), so the replay is
    // bit-exact. DuckDB `//` and Spark `div` agree on positive longs.
    // G1's unrolled-CTE replay with the teleport confined to the seed
    // cohort (nation-0 customers); integer arithmetic → hash-exact
    "g_ppr" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), ed AS (
          |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d USING (src)
          |), seeds AS (
          |  SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = 0
          |), r0 AS (
          |  SELECT src AS node,
          |    CAST(CASE WHEN src IN (SELECT node FROM seeds)
          |         THEN 1000000 ELSE 0 END AS BIGINT) AS r
          |  FROM deg
          |)""".stripMargin
      val iters = (1 to 5).map { i =>
        s""", r$i AS (
           |  SELECT ed.dst AS node,
           |    CAST(CASE WHEN ed.dst IN (SELECT node FROM seeds)
           |           THEN 150000 ELSE 0 END
           |      + (85 * sum(r.r // ed.d)) // 100 AS BIGINT) AS r
           |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst
           |)""".stripMargin
      }.mkString
      base + iters +
        """
          |SELECT node, r AS rank_micro,
          |  node IN (SELECT node FROM seeds) AS is_seed
          |FROM r5 ORDER BY r DESC, node LIMIT 20""".stripMargin
    },
    "g_pagerank" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), ed AS (
          |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d USING (src)
          |), r0 AS (
          |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
          |)""".stripMargin
      val iters = (1 to 5).map { i =>
        s""", r$i AS (
           |  SELECT ed.dst AS node,
           |    CAST(150000 + (85 * sum(r.r // ed.d)) // 100 AS BIGINT) AS r
           |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst
           |)""".stripMargin
      }.mkString
      base + iters +
        "\nSELECT node, r AS rank_micro FROM r5 ORDER BY r DESC, node LIMIT 20"
    },
    "g_communities" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), l0 AS (
          |  SELECT DISTINCT src AS node, src AS label FROM edges
          |)""".stripMargin
      val iters = (1 to 4).map { i =>
        s""", l$i AS (
           |  SELECT node, label FROM (
           |    SELECT e.dst AS node, l.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY e.dst
           |        ORDER BY count(*) DESC, l.label ASC) AS rn
           |    FROM edges e JOIN l${i - 1} l ON l.node = e.src
           |    GROUP BY e.dst, l.label
           |  ) WHERE rn = 1
           |)""".stripMargin
      }.mkString
      base + iters +
        "\nSELECT node, label AS community FROM l4 ORDER BY node"
    },
    // G10: the oracle reaches the same component labels by transitive
    // closure (recursive CTE) + min-reachable-id — a different route
    // than the engine's pointer jumping, valid because converged
    // min-label CC is schedule-independent (label = component min)
    "g_components" ->
      """WITH RECURSIVE b AS (
        |  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT o_orderkey) >= 2
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM b UNION SELECT b, a FROM b
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS node, min(reach) AS component FROM walk GROUP BY 1
        |), sz AS (
        |  SELECT component, CAST(count(*) AS BIGINT) AS comp_size
        |  FROM lbl GROUP BY 1
        |)
        |SELECT l.node, l.component, s.comp_size
        |FROM lbl l JOIN sz s USING (component) ORDER BY node""".stripMargin,
    "g_triangles" ->
      """WITH pp AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |), deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM pp UNION ALL SELECT b AS n FROM pp
        |  ) GROUP BY n
        |), o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.a ELSE pp.b END AS src,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.b ELSE pp.a END AS dst
        |  FROM pp JOIN deg da ON da.n = pp.a JOIN deg db ON db.n = pp.b
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM pp) AS n_edges,
        |       (SELECT CAST(count(*) AS BIGINT)
        |        FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |          JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles""".stripMargin,
    // G15: 4 unrolled peel stages; per stage canonical a<b<c triangle
    // enumeration credits each triangle's three edges, support < k-2
    // drops the edge — bit-for-bit the Spark loop (support is
    // orientation-independent)
    "g_ktruss" -> {
      val base =
        """WITH e0 AS MATERIALIZED (
          |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          |  FROM lineitem x JOIN lineitem y
          |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
          |)""".stripMargin
      val stages = (1 to 4).map { i =>
        s""",
           |t$i AS MATERIALIZED (
           |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM e${i - 1} e1 JOIN e${i - 1} e2 ON e2.a = e1.b
           |  JOIN e${i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
           |c$i AS (
           |  SELECT x AS a, y AS b FROM t$i
           |  UNION ALL SELECT x, z FROM t$i
           |  UNION ALL SELECT y, z FROM t$i),
           |e$i AS MATERIALIZED (
           |  SELECT a, b FROM c$i GROUP BY a, b HAVING count(*) >= 2)""".stripMargin
      }.mkString
      base + stages +
        """
          |SELECT node, CAST(count(*) AS BIGINT) AS truss_degree FROM (
          |  SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4
          |) GROUP BY node ORDER BY node""".stripMargin
    },
    // Bellman-Ford SSSP: 6 unrolled min-plus stages replay the Spark
    // loop exactly (integer weights, INF sentinel, floor division)
    "g_sssp" -> {
      val inf = "1000000000000000"
      val base =
        """WITH w0 AS (
          |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, count(*) AS n
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |  GROUP BY 1, 2
          |), e AS (
          |  SELECT src, dst, greatest(1, 1000000 // n) AS w FROM w0
          |  UNION ALL
          |  SELECT dst, src, greatest(1, 1000000 // n) FROM w0
          |), sse AS (SELECT min(src) AS sid FROM e),
          |d0 AS (
          |  SELECT n.node, CASE WHEN n.node = sse.sid THEN 0 ELSE %INF% END AS dist
          |  FROM (SELECT DISTINCT src AS node FROM e) n, sse
          |)""".stripMargin.replace("%INF%", inf)
      val stages = (1 to 6).map { i =>
        s""",
           |d$i AS (
           |  SELECT d.node, least(d.dist, coalesce(r.cand, $inf)) AS dist
           |  FROM d${i - 1} d LEFT JOIN (
           |    SELECT e.dst AS node, min(p.dist + e.w) AS cand
           |    FROM e JOIN d${i - 1} p ON p.node = e.src
           |    WHERE p.dist < $inf
           |    GROUP BY e.dst
           |  ) r ON r.node = d.node
           |)""".stripMargin
      }.mkString
      base + stages +
        s"\nSELECT node, CAST(dist AS BIGINT) AS dist_micro FROM d6" +
        s"\nWHERE dist < $inf ORDER BY dist, node LIMIT 20"
    },
    // G11: unrolled multi-source BFS replay — (node, landmark) state,
    // min-combine per hop, integer micro harmonic sum, total-order tie
    "g_closeness" -> {
      val base =
        """WITH p AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e AS (
          |  SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p
          |), lms AS (
          |  SELECT node FROM (SELECT DISTINCT src AS node FROM e) ORDER BY node LIMIT 8
          |), d0 AS (
          |  SELECT node, node AS lm, 0 AS dist FROM lms
          |)""".stripMargin
      val stages = (1 to 4).map { i =>
        s""",
           |d$i AS (
           |  SELECT node, lm, min(dist) AS dist FROM (
           |    SELECT node, lm, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, pd.lm, pd.dist + 1 AS dist
           |    FROM e JOIN d${i - 1} pd ON pd.node = e.src
           |  ) u GROUP BY 1, 2
           |)""".stripMargin
      }.mkString
      base + stages +
        """
          |SELECT node, cast(count(*) AS bigint) AS n_landmarks,
          |  cast(sum(1000000 // dist) AS bigint) AS harmonic_micro
          |FROM d4 WHERE dist > 0
          |GROUP BY node ORDER BY harmonic_micro DESC, node LIMIT 20""".stripMargin
    },
    // item-item Jaccard: candidates from the per-part self-join over
    // the degree-capped bipartite graph; similarity is exact over the
    // capped feature universe on both engines
    "g_adamic_adar" ->
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), sdeg AS (
        |  SELECT s, CAST(floor(1000000.0 / ln(d) + 0.5) AS BIGINT) AS w_micro
        |  FROM (SELECT s, count(*) AS d FROM cs GROUP BY s)
        |  WHERE d >= 2 AND d <= 50
        |), w AS (
        |  SELECT x.c AS a, y.c AS b, sdeg.w_micro
        |  FROM cs x JOIN cs y ON x.s = y.s AND x.c < y.c
        |  JOIN sdeg ON sdeg.s = x.s
        |)
        |SELECT a, b, count(*) AS n_common, CAST(sum(w_micro) AS BIGINT) AS aa_micro
        |FROM w GROUP BY a, b
        |ORDER BY aa_micro DESC, a, b LIMIT 25""".stripMargin,
    "g_jaccard" ->
      """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |pdeg AS (SELECT p, count(*) AS pd FROM sp GROUP BY p),
        |capped AS (SELECT s, sp.p AS p FROM sp JOIN pdeg USING (p) WHERE pd <= 50),
        |sz AS (SELECT s, count(*) AS sz FROM capped GROUP BY s),
        |i AS (SELECT x.s AS a, y.s AS b, count(*) AS n_shared
        |      FROM capped x JOIN capped y ON x.p = y.p AND x.s < y.s
        |      GROUP BY 1, 2)
        |SELECT a, b, n_shared, sa.sz + sb.sz - n_shared AS n_union,
        |  (1000000 * n_shared) // (sa.sz + sb.sz - n_shared) AS jaccard_micro
        |FROM i JOIN sz sa ON sa.s = i.a JOIN sz sb ON sb.s = i.b
        |ORDER BY jaccard_micro DESC, a, b LIMIT 25""".stripMargin,
    // local clustering: G2's oriented wedge join, each triangle
    // credits its three corners
    "g_clustering" ->
      """WITH pp AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |), deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM pp UNION ALL SELECT b AS n FROM pp
        |  ) GROUP BY n
        |), o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.a ELSE pp.b END AS src,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.b ELSE pp.a END AS dst
        |  FROM pp JOIN deg da ON da.n = pp.a JOIN deg db ON db.n = pp.b
        |), tri AS (
        |  SELECT n, count(*) AS tri FROM (
        |    SELECT unnest([e1.src, e1.dst, e2.dst]) AS n
        |    FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |      JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |  ) GROUP BY n
        |)
        |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(coalesce(tri.tri, 0) AS BIGINT) AS n_triangles,
        |  (2000000 * CAST(coalesce(tri.tri, 0) AS BIGINT)) // (deg.d * (deg.d - 1))
        |    AS cc_micro
        |FROM deg LEFT JOIN tri ON tri.n = deg.n
        |WHERE deg.d >= 2
        |ORDER BY cc_micro DESC, node LIMIT 25""".stripMargin,
    // k-core: 8 unrolled synchronous peel stages replay the loop
    "g_kcore" -> {
      val base =
        """WITH pp AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e0 AS (
          |  SELECT src, dst FROM pp UNION ALL SELECT dst, src FROM pp
          |)""".stripMargin
      // MATERIALIZED: each stage references its predecessor three
      // times — default CTE inlining makes that 3^8 scans of the base
      // tables ("too many open files"), materialization keeps it 8
      val stages = (1 to 8).map { i =>
        s""",
           |k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= 3),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |        JOIN k$i a ON a.src = e.src JOIN k$i b ON b.src = e.dst)""".stripMargin
      }.mkString
      base + stages +
        "\nSELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree" +
        "\nFROM e8 GROUP BY 1 ORDER BY 1"
    }
  )
}
