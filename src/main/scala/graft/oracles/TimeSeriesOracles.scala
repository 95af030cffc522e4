package graft.oracles

/** DuckDB-dialect oracle SQL for the time-series operators.
  *
  * Split out of SparkEntry (VERDICT r9 "Next round" #6) — the strings
  * are the driver-contract oracles; column names must match the Spark
  * plans exactly (the compare sorts columns by name before hashing).
  */
private[graft] object TimeSeriesOracles {
  val sql: Map[String, String] = Map(
    // identical window frame, identical double-assembly order over
    // exact HUGEINT window sums
    "ts_ols" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), idx AS (
        |  SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), s AS (
        |  SELECT d, y, t,
        |    count(*) OVER w AS n,
        |    sum(CAST(y AS HUGEINT)) OVER w AS sy,
        |    sum(CAST(t * y AS HUGEINT)) OVER w AS sty,
        |    sum(CAST(t AS HUGEINT)) OVER w AS st,
        |    sum(CAST(t * t AS HUGEINT)) OVER w AS st2
        |  FROM idx
        |  WINDOW w AS (ORDER BY t ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
        |), f AS (
        |  SELECT d, y, t, n,
        |    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(st2 AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
        |    CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS tdev
        |  FROM s WHERE n >= 8
        |)
        |SELECT d, y AS y_micro,
        |  CAST(round(slope) AS BIGINT) AS slope_micro_per_day,
        |  CAST(round(ybar + slope * tdev) AS BIGINT) AS forecast_micro,
        |  abs(y - CAST(round(ybar + slope * tdev) AS BIGINT)) AS abs_err_micro
        |FROM f ORDER BY d""".stripMargin,
    "ts_snaive" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |)
        |SELECT a.d, a.y AS actual_micro, b.y AS forecast_micro,
        |  abs(a.y - b.y) AS abs_err_micro
        |FROM daily a JOIN daily b ON a.d = b.d + 7
        |ORDER BY a.d""".stripMargin,
    "ts_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT datediff('day', DATE '1995-01-01', d) AS x, y FROM daily
        |), g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM dd
        |)
        |SELECT CAST(((x % 7) + 7) % 7 AS INT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(round(CAST(sum(y) AS DOUBLE) / count(*)) AS BIGINT) AS dow_mean_micro,
        |  CAST(round(CAST(sum(y) AS DOUBLE) * CAST(g.n AS DOUBLE) * 1e6 /
        |    (CAST(count(*) AS DOUBLE) * CAST(g.sy AS DOUBLE))) AS BIGINT)
        |    AS seasonal_ratio_micro,
        |  CAST(round(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE) /
        |    CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)) AS BIGINT)
        |    AS slope_micro_per_day
        |FROM dd, g
        |GROUP BY ((x % 7) + 7) % 7, g.n, g.sy, g.sxy, g.sx, g.sxx
        |ORDER BY dow""".stripMargin,
    // F10: same F2 slope CTE; floor-means on the min-shifted detrended
    // series (div vs // agree on nonnegatives); HUGEINT variance
    // numerators; one double division per score at the end
    "ts_strength" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT datediff('day', DATE '1995-01-01', d) AS x, y FROM daily
        |), g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM dd
        |), sl AS (
        |  SELECT CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope
        |  FROM g
        |), z0 AS (
        |  SELECT x, y, y - sl.slope * x AS z,
        |    CAST(((x % 7) + 7) % 7 AS INT) AS dow
        |  FROM dd, sl
        |), zm AS (SELECT min(z) AS zmin FROM z0),
        |z AS (SELECT z0.*, z0.z - zm.zmin AS zp FROM z0, zm),
        |sd AS (SELECT dow, sum(zp) // count(*) AS mp FROM z GROUP BY 1),
        |r AS (
        |  SELECT z.z, z.zp - sd.mp AS r, z.y - (sd.mp + zm.zmin) AS des
        |  FROM z JOIN sd USING (dow), zm
        |), v AS (
        |  SELECT count(*) AS n,
        |    count(*) * sum(CAST(z AS HUGEINT) * z) -
        |      sum(CAST(z AS HUGEINT)) * sum(CAST(z AS HUGEINT)) AS dz,
        |    count(*) * sum(CAST(r AS HUGEINT) * r) -
        |      sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)) AS dr,
        |    count(*) * sum(CAST(des AS HUGEINT) * des) -
        |      sum(CAST(des AS HUGEINT)) * sum(CAST(des AS HUGEINT)) AS dd2
        |  FROM r
        |)
        |SELECT CAST(v.n AS BIGINT) AS n_days, sl.slope AS slope_micro_per_day,
        |  CASE WHEN dz > 0 THEN CAST(round(1e6 * greatest(0.0,
        |    1.0 - CAST(dr AS DOUBLE) / CAST(dz AS DOUBLE))) AS BIGINT) END
        |    AS seasonal_strength_micro,
        |  CASE WHEN dd2 > 0 THEN CAST(round(1e6 * greatest(0.0,
        |    1.0 - CAST(dr AS DOUBLE) / CAST(dd2 AS DOUBLE))) AS BIGINT) END
        |    AS trend_strength_micro
        |FROM v, sl""".stripMargin,
    // Theil-Sen: floor(x+0.5) slopes on bit-equal integer divisions,
    // percentile_disc median — order statistics only
    "ts_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT d, y, CAST(((datediff('day', DATE '1995-01-01', d) % 7) + 7) % 7 AS BIGINT) AS dow
        |  FROM daily
        |), sgn AS (
        |  SELECT a.dow AS dow,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM dd a JOIN dd b ON a.dow = b.dow AND a.d < b.d GROUP BY 1
        |), cnt AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n FROM dd GROUP BY 1
        |), ties AS (
        |  SELECT dow, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT dow, y, CAST(count(*) AS BIGINT) AS t FROM dd GROUP BY 1, 2)
        |  WHERE t > 1 GROUP BY dow
        |), base AS (
        |  SELECT cnt.dow, cnt.n, coalesce(sgn.s, 0) AS s,
        |    cnt.n * (cnt.n - 1) * (2 * cnt.n + 5) - coalesce(ties.tie_term, 0) AS var18
        |  FROM cnt LEFT JOIN sgn ON cnt.dow = sgn.dow
        |  LEFT JOIN ties ON cnt.dow = ties.dow
        |), z AS (
        |  SELECT dow, n, s, var18,
        |    CASE WHEN var18 <= 0 THEN 0
        |    ELSE CAST(floor((CAST(CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) AS BIGINT) END AS z_micro
        |  FROM base
        |)
        |SELECT dow, n, s, var18, z_micro,
        |  CASE WHEN z_micro >= 1959964 THEN 'increasing'
        |    WHEN z_micro <= -1959964 THEN 'decreasing'
        |    ELSE 'no_trend' END AS trend
        |FROM z ORDER BY dow""".stripMargin,
    "ts_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d0 AS (
        |  SELECT CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT) AS x, y
        |  FROM daily
        |), p AS (
        |  SELECT CAST(floor(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) + 0.5) AS BIGINT) AS s
        |  FROM d0 a JOIN d0 b ON a.x < b.x
        |)
        |SELECT (SELECT count(*) FROM daily) AS n_days,
        |  count(*) AS n_pairs,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s) AS BIGINT)
        |    AS slope_micro_per_day
        |FROM p""".stripMargin,
    // seasonal-residual anomaly: per-DOW median level removed first,
    // then the 3·1.4826·MAD gate — order statistics only, no big sums
    "ts_residual_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d0 AS (
        |  SELECT d, y, CAST(((datediff('day', DATE '1995-01-01', d) % 7) + 7) % 7 AS INT) AS dow
        |  FROM daily
        |), dm AS (
        |  SELECT dow,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY y) AS BIGINT) AS dow_med
        |  FROM d0 GROUP BY dow
        |), r AS (
        |  SELECT d, y, d0.dow, dow_med,
        |    y - dow_med AS resid_micro, abs(y - dow_med) AS ad
        |  FROM d0 JOIN dm ON d0.dow = dm.dow
        |), m AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT) AS mad
        |  FROM r
        |)
        |SELECT d, y AS y_micro, dow, dow_med, resid_micro, mad AS mad_micro,
        |  (mad > 0 AND ad > 3.0 * 1.4826 * mad) AS is_anomaly
        |FROM r, m ORDER BY d""".stripMargin,
    "ts_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), t AS (
        |  SELECT sum(y) AS total, count(*) AS n FROM daily
        |), c AS (
        |  SELECT d, y,
        |    sum(y) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cs,
        |    row_number() OVER (ORDER BY d) AS i
        |  FROM daily
        |), s AS (
        |  SELECT c.d, c.y,
        |    CAST(c.cs - c.i * (t.total // t.n) AS BIGINT) AS cusum_micro
        |  FROM c, t
        |)
        |SELECT d, y AS y_micro, cusum_micro,
        |  (row_number() OVER (ORDER BY abs(cusum_micro) DESC, d) = 1) AS is_changepoint
        |FROM s ORDER BY d""".stripMargin,
    // weights interpolated from the same ewmaWeights the Spark plan
    // compiles in — exact integers, HUGEINT ↔ decimal(38,0) numerator
    "ts_ewma" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (w, j) => s"($j, $w)" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), i AS (
         |  SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily
         |), wts AS (
         |  SELECT * FROM (VALUES $vals) AS t(j, wt)
         |), a AS (
         |  SELECT i.i + w.j AS ti,
         |    sum(CAST(i.y AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM i, wts w GROUP BY 1
         |)
         |SELECT i.d, i.y AS y_micro,
         |  CAST(round(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)) AS BIGINT)
         |    AS ewma_micro,
         |  i.y - CAST(round(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)) AS BIGINT)
         |    AS dev_micro
         |FROM i JOIN a ON a.ti = i.i ORDER BY d""".stripMargin
    },
    // F11: F4's exact truncated-EWMA pass applied twice (s2 smooths
    // the ROUNDED s1 longs, so both passes replay bit-equal), then
    // Brown's level/trend with the one α/(1−α)=1/3 division on
    // bit-equal integers — an integer/3.0 can never land on a .5
    // rounding boundary, so round() agrees across engines
    "ts_holt" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (w, j) => s"($j, $w)" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), i1 AS (
         |  SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily
         |), wts AS (
         |  SELECT * FROM (VALUES $vals) AS t(j, wt)
         |), a1 AS (
         |  SELECT i1.i + w.j AS ti,
         |    sum(CAST(i1.y AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM i1, wts w GROUP BY 1
         |), p1 AS (
         |  SELECT i1.d, i1.y, i1.i,
         |    CAST(round(CAST(a1.num AS DOUBLE) / CAST(a1.den AS DOUBLE)) AS BIGINT) AS s1
         |  FROM i1 JOIN a1 ON a1.ti = i1.i
         |), a2 AS (
         |  SELECT p.i + w.j AS ti,
         |    sum(CAST(p.s1 AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM p1 p, wts w GROUP BY 1
         |), p2 AS (
         |  SELECT p1.d, p1.y, p1.s1,
         |    CAST(round(CAST(a2.num AS DOUBLE) / CAST(a2.den AS DOUBLE)) AS BIGINT) AS s2
         |  FROM p1 JOIN a2 ON a2.ti = p1.i
         |), f AS (
         |  SELECT d, y, 2 * s1 - s2 AS lvl,
         |    CAST(round(CAST(s1 - s2 AS DOUBLE) / 3.0) AS BIGINT) AS trend
         |  FROM p2
         |), b AS (
         |  SELECT d, y AS y_micro,
         |    lag(lvl) OVER (ORDER BY d) + lag(trend) OVER (ORDER BY d)
         |      AS forecast_micro
         |  FROM f
         |)
         |SELECT d, y_micro, forecast_micro,
         |  abs(y_micro - forecast_micro) AS abs_err_micro
         |FROM b WHERE forecast_micro IS NOT NULL ORDER BY d""".stripMargin
    },
    // F14: trailing per-dow floor-mean seasonal (strictly past rows,
    // nonneg longs so // ↔ div agree), then ts_holt's exact Brown
    // chain over the deseasonalized residual, forecast re-adds the
    // current row's seasonal
    "ts_holt_winters" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (w, j) => s"($j, $w)" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), dx AS (
         |  SELECT d, y,
         |    ((datediff('day', DATE '1995-01-01', d) % 7) + 7) % 7 AS dow
         |  FROM daily
         |), sw AS (
         |  SELECT d, y,
         |    count(*) OVER w AS sn,
         |    sum(CAST(y AS HUGEINT)) OVER w AS ssum
         |  FROM dx
         |  WINDOW w AS (PARTITION BY dow ORDER BY d
         |               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)
         |), se AS (
         |  SELECT d, y, CAST(ssum // sn AS BIGINT) AS seasonal
         |  FROM sw WHERE sn = 4
         |), i1 AS (
         |  SELECT d, y, seasonal, y - seasonal AS yd,
         |    row_number() OVER (ORDER BY d) AS i
         |  FROM se
         |), wts AS (
         |  SELECT * FROM (VALUES $vals) AS t(j, wt)
         |), a1 AS (
         |  SELECT i1.i + w.j AS ti,
         |    sum(CAST(i1.yd AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM i1, wts w GROUP BY 1
         |), p1 AS (
         |  SELECT i1.d, i1.y, i1.seasonal, i1.i,
         |    CAST(round(CAST(a1.num AS DOUBLE) / CAST(a1.den AS DOUBLE)) AS BIGINT) AS s1
         |  FROM i1 JOIN a1 ON a1.ti = i1.i
         |), a2 AS (
         |  SELECT p.i + w.j AS ti,
         |    sum(CAST(p.s1 AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM p1 p, wts w GROUP BY 1
         |), p2 AS (
         |  SELECT p1.d, p1.y, p1.seasonal, p1.s1,
         |    CAST(round(CAST(a2.num AS DOUBLE) / CAST(a2.den AS DOUBLE)) AS BIGINT) AS s2
         |  FROM p1 JOIN a2 ON a2.ti = p1.i
         |), f AS (
         |  SELECT d, y, seasonal, 2 * s1 - s2 AS lvl,
         |    CAST(round(CAST(s1 - s2 AS DOUBLE) / 3.0) AS BIGINT) AS trend
         |  FROM p2
         |), b AS (
         |  SELECT d, y AS y_micro, seasonal AS seasonal_micro,
         |    lag(lvl) OVER (ORDER BY d) + lag(trend) OVER (ORDER BY d)
         |      + seasonal AS forecast_micro
         |  FROM f
         |)
         |SELECT d, y_micro, seasonal_micro, forecast_micro,
         |  abs(y_micro - forecast_micro) AS abs_err_micro
         |FROM b WHERE forecast_micro IS NOT NULL ORDER BY d""".stripMargin
    },
    // F12: per-term micro-rounded cos/sin (the adamic-adar ln
    // convention) then exact HUGEINT sums; the normalization is the
    // same IEEE op sequence on bit-equal integers in both engines
    "ts_periodogram" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), i AS (
        |  SELECT d, y, row_number() OVER (ORDER BY d) - 1 AS t FROM daily
        |), st AS (
        |  SELECT CAST(sum(y) AS BIGINT) AS sy, count(*) AS n FROM i
        |), c AS (
        |  SELECT i.t, i.y - (st.sy // st.n) AS yc, st.n, p.p
        |  FROM i, st, (SELECT unnest(range(2, 15)) AS p) p
        |), tm AS (
        |  SELECT p, n, yc,
        |    CAST(round(cos((t % p) * 6.283185307179586 / p) * 1e6) AS BIGINT) AS cv,
        |    CAST(round(sin((t % p) * 6.283185307179586 / p) * 1e6) AS BIGINT) AS sv
        |  FROM c
        |), pr AS (
        |  SELECT p,
        |    sum(CAST(yc AS HUGEINT) * cv) AS cc,
        |    sum(CAST(yc AS HUGEINT) * sv) AS ss,
        |    max(n) AS n
        |  FROM tm GROUP BY p
        |), nd AS (
        |  SELECT CAST(p AS BIGINT) AS period,
        |    CAST(cc AS DOUBLE) / n / 1e12 AS cd,
        |    CAST(ss AS DOUBLE) / n / 1e12 AS sd
        |  FROM pr
        |), pw AS (
        |  SELECT period, cd * cd + sd * sd AS spec_power FROM nd
        |)
        |SELECT period, spec_power,
        |  (row_number() OVER (ORDER BY spec_power DESC, period) = 1
        |    AND spec_power > 0) AS dominant
        |FROM pw ORDER BY period""".stripMargin,
    // F13: per-part demand-event weight expansion; z/p/rate each one
    // rounded double division over bit-equal integers
    "ts_croston" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (wt, j) => s"($j, $wt)" }.mkString(", ")
      s"""WITH demand AS (
         |  SELECT l_partkey AS part, CAST(o_orderdate AS DATE) AS d,
         |    CAST(round(sum(l_quantity) * 1e6) AS BIGINT) AS q
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2
         |), i AS (
         |  SELECT part, d, q,
         |    row_number() OVER (PARTITION BY part ORDER BY d) AS i,
         |    coalesce(date_diff('day',
         |      lag(d) OVER (PARTITION BY part ORDER BY d), d), 1) * 1000000
         |      AS gap_micro
         |  FROM demand
         |), nn AS (SELECT part, max(i) AS n FROM i GROUP BY 1),
         |wts AS (SELECT * FROM (VALUES $vals) AS t(j, wt)),
         |sm AS (
         |  SELECT i.part, nn.n,
         |    sum(CAST(i.q AS HUGEINT) * w.wt) AS znum,
         |    sum(CAST(i.gap_micro AS HUGEINT) * w.wt) AS pnum,
         |    sum(w.wt) AS den
         |  FROM i JOIN nn ON nn.part = i.part
         |  JOIN wts w ON w.j = nn.n - i.i
         |  WHERE nn.n - i.i < 14
         |  GROUP BY 1, 2
         |), fin AS (
         |  SELECT part, CAST(n AS BIGINT) AS n_demands,
         |    CAST(round(CAST(znum AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT) AS z_micro,
         |    CAST(round(CAST(pnum AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT) AS p_micro
         |  FROM sm WHERE n >= 5
         |)
         |SELECT part, n_demands, z_micro, p_micro,
         |  CAST(round(1e6 * CAST(z_micro AS DOUBLE) / CAST(p_micro AS DOUBLE)) AS BIGINT)
         |    AS rate_micro
         |FROM fin ORDER BY rate_micro DESC, part LIMIT 20""".stripMargin
    },
    // ACF: floor-mean deviations, HUGEINT term products, one double
    // division per lag on bit-equal 128-bit integers
    "ts_acf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), g AS (
        |  SELECT sum(y) AS total, count(*) AS n FROM daily
        |), dev AS (
        |  SELECT d, CAST(y - (g.total // g.n) AS BIGINT) AS dev,
        |    row_number() OVER (ORDER BY d) AS rn
        |  FROM daily, g
        |), den AS (
        |  SELECT sum(CAST(dev AS HUGEINT) * dev) AS den FROM dev
        |), p AS (
        |  SELECT u.k AS k, count(*) AS n_pairs,
        |    sum(CAST(a.dev AS HUGEINT) * b.dev) AS num
        |  FROM dev a CROSS JOIN unnest(generate_series(1, 14)) AS u(k)
        |  JOIN dev b ON b.rn = a.rn - u.k
        |  GROUP BY u.k
        |)
        |SELECT CAST(k AS INT) AS lag, n_pairs,
        |  CAST(round(CAST(num AS DOUBLE) * 1e6 / CAST(den AS DOUBLE)) AS BIGINT) AS acf_micro
        |FROM p, den ORDER BY lag""".stripMargin
  )
}
