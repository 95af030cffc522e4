package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series analytics over the daily order-revenue series (SURVEY
  * §2 F1–F3) — the monitoring layer every warehouse grows on top of
  * its fact tables: backtested forecasting, trend/seasonality
  * decomposition, and changepoint detection.
  *
  * All three are exact integer-micro arithmetic over the aggregated
  * daily series, so the DuckDB oracle replays them hash-exact (the
  * iterative-operator determinism contract). The daily series itself
  * is one map-side-combinable aggregation of the fact table — the
  * only pass that touches fact rows at any scale; everything after
  * operates on |days| rows (bounded: a decade is ~3.7k rows), so the
  * global ordered windows below are the same deliberately-bounded
  * shape as the rolling-median/7-day operators (design-noted there).
  */
object TimeSeries {

  /** Daily revenue micro-longs: (d DATE, y = Σ round(price·1e6)). */
  private def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("o_totalprice") * lit(1e6)).cast("long")).as("y"))

  /** F1: seasonal-naive forecast backtest — forecast(d) = actual(d−7),
    * the standard baseline every real forecaster must beat, evaluated
    * as a per-day backtest (actual, forecast, absolute error). One
    * self-join of the daily series on a 7-day shift; days without a
    * d−7 observation are excluded (no forecast exists).
    */
  def snaive(spark: SparkSession, dir: String): DataFrame =
    snaiveOf(daily(spark, dir))

  /** [[snaive]]'s core over ANY (d DATE, y LONG) daily series — split
    * out so specs can feed hand series.
    */
  private[graft] def snaiveOf(base: DataFrame): DataFrame = {
    base.as("cur")
      .join(base.select(date_add(col("d"), 7).as("d"), col("y").as("forecast_micro")), Seq("d"))
      .select(col("d"), col("y").as("actual_micro"), col("forecast_micro"),
        abs(col("y") - col("forecast_micro")).as("abs_err_micro"))
      .orderBy("d")
  }

  /** F2: trend + weekly-seasonality decomposition — the two numbers a
    * corpus/revenue monitor actually wants: the least-squares daily
    * trend slope, and a per-day-of-week seasonal index.
    *
    * Exactness: x = days since a FIXED epoch (1995-01-01 — slope is
    * shift-invariant, and a fixed reference is engine-identical,
    * unlike dayofweek whose origin differs between Spark and DuckDB;
    * dow = x mod 7). All sums are exact integers — Σxy overflows
    * int64 (x ≤ thousands × y ~ 1e13 micro × |days|), so it
    * accumulates as decimal(38,0) on Spark and HUGEINT in DuckDB,
    * both exact 128-bit — and divisions happen once, at the end, on
    * bit-equal integer inputs, so the rounded doubles match.
    */
  def decompose(spark: SparkSession, dir: String): DataFrame = {
    val d = daily(spark, dir)
      .select(datediff(col("d"), lit("1995-01-01").cast("date")).cast("long").as("x"), col("y"))
    val g = d.agg(
      count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val slope = ((col("n").cast("decimal(38,0)") * col("sxy") -
        col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
    val global = g.select(col("n"), col("sy"), round(slope).cast("long").as("slope_micro_per_day"))
    d.groupBy((((col("x") % 7) + 7) % 7).cast("int").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("y").cast("decimal(38,0)")).as("syd"))
      .crossJoin(global)
      .select(col("dow"), col("n_days"),
        round(col("syd").cast("double") / col("n_days")).cast("long").as("dow_mean_micro"),
        round(col("syd").cast("double") * col("n").cast("double") * 1e6 /
          (col("n_days").cast("double") * col("sy").cast("double"))).cast("long")
          .as("seasonal_ratio_micro"),
        col("slope_micro_per_day"))
      .orderBy("dow")
  }

  /** F10: seasonal/trend STRENGTH — the two [0,1] scores from the STL
    * playbook (Hyndman & Athanasopoulos, "Forecasting: Principles and
    * Practice" §12/STL features: F_s = max(0, 1 − Var(R)/Var(y−T)),
    * F_t = max(0, 1 − Var(R)/Var(y−S))) that turn F2's decomposition
    * into a single monitorable number per signal — "is this series
    * seasonal enough to warrant a seasonal model?" feeds model
    * selection and the anomaly-detector choice (F6 needs seasonality;
    * CUSUM doesn't).
    *
    * Components reuse F2's exact contract: T_t = slope_micro·x (the
    * micro-rounded least-squares slope; intercepts cancel under
    * variance), S = per-day-of-week FLOOR mean of the detrended
    * series (F3's `div` discipline — keeps every residual an exact
    * long), R = detrended − S. Variance numerators n·Σq² − (Σq)²
    * accumulate as decimal(38,0) ↔ HUGEINT (q ~ 1e13 micro squares
    * to 1e26, far past int64; the shared /n² cancels in the ratio),
    * and the ONE double division per score happens at the end on
    * bit-equal integers — hash-exact oracle replay.
    *
    * Scale shape: fact rows are touched once by the daily aggregate;
    * the two scalar passes after (slope, then strengths) run over
    * |days| rows with map-side-combinable sums and broadcast scalars
    * — no window, no shuffle beyond the daily rollup.
    */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame =
    seasonalStrengthOf(daily(spark, dir))

  /** [[seasonalStrength]]'s core over ANY (d DATE, y LONG) daily
    * series — split out so specs can feed hand series (pure weekly
    * cycle → F_s = 1; pure linear trend → F_s = 0, F_t = 1).
    */
  private[graft] def seasonalStrengthOf(base: DataFrame): DataFrame = {
    val d = base
      .select(datediff(col("d"), lit("1995-01-01").cast("date")).cast("long").as("x"),
        col("y"))
    val g = d.agg(
      count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val slope = ((col("n").cast("decimal(38,0)") * col("sxy") -
        col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
    val global = g.select(round(slope).cast("long").as("slope_micro_per_day"))
    val z0 = d.crossJoin(broadcast(global))
      .select(col("x"), col("y"), col("slope_micro_per_day"),
        (col("y") - col("slope_micro_per_day") * col("x")).as("z"),
        (((col("x") % 7) + 7) % 7).cast("int").as("dow"))
    // shift the detrended series by its min BEFORE the div floor-mean:
    // Spark's `div` truncates toward zero while DuckDB's `//` floors,
    // so they disagree exactly when the dividend is negative; on the
    // shifted (nonnegative) series both are the same floor, and since
    // floormean(z − c) = floormean(z) − c for integer c the residuals
    // r and the deseasonalized series are unchanged by the shift
    val zmin = z0.agg(min("z").as("zmin"))
    val z = z0.crossJoin(broadcast(zmin))
      .withColumn("zp", col("z") - col("zmin"))
    val sdow = z.groupBy("dow")
      .agg(expr("sum(zp) div count(1)").as("mp")) // floor mean: exact long
    val r = z.join(broadcast(sdow), "dow")
      .select(col("slope_micro_per_day"), col("z"),
        (col("zp") - col("mp")).as("r"),
        (col("y") - (col("mp") + col("zmin"))).as("des"))
    def varNum(c: String) =
      (count(lit(1)).cast("decimal(38,0)") *
        sum((col(c).cast("decimal(38,0)") * col(c).cast("decimal(38,0)"))) -
        sum(col(c).cast("decimal(38,0)")) * sum(col(c).cast("decimal(38,0)")))
    r.agg(
        count(lit(1)).as("n_days"),
        min("slope_micro_per_day").as("slope_micro_per_day"),
        varNum("z").as("dz"), varNum("r").as("dr"), varNum("des").as("dd"))
      .select(col("n_days"), col("slope_micro_per_day"),
        when(col("dz") > 0, round(lit(1e6) *
          greatest(lit(0.0), lit(1.0) - col("dr").cast("double") / col("dz").cast("double")))
          .cast("long")).as("seasonal_strength_micro"),
        when(col("dd") > 0, round(lit(1e6) *
          greatest(lit(0.0), lit(1.0) - col("dr").cast("double") / col("dd").cast("double")))
          .cast("long")).as("trend_strength_micro"))
  }

  /** F3: CUSUM changepoint detection — cumulative sum of deviations
    * from the series mean; the day where |CUSUM| peaks is the
    * level-shift point (Page's classic chart, the offline scan form).
    *
    * Exactness: the baseline is the FLOOR mean (`total div n`), which
    * keeps every term a bounded int64 (scaling the deviations by n —
    * the exact-mean alternative — overflows; the floor variant drifts
    * the cusum by at most i·(total mod n)/n < n, noise at micro
    * scale, and both engines replay the same floor). The peak flag is
    * rank 1 by (|cusum| desc, d asc) — deterministic ties to the
    * earliest day.
    */
  def cusum(spark: SparkSession, dir: String): DataFrame =
    cusumOf(daily(spark, dir))

  /** F4: EWMA smoothing — the exponentially-weighted moving average
    * every streaming monitor layers under its alert thresholds
    * (recent days dominate, old shocks decay geometrically), plus the
    * per-day deviation y − ewma that feeds them.
    *
    * Exactness: the textbook recurrence s_t = α·y_t + (1−α)·s_{t−1}
    * never stabilizes across engines (an infinite product of doubles).
    * Instead: α = 1/4 (rational) and truncation at L = 14 lags — the
    * dropped tail mass (3/4)^14 < 2% — with weights RENORMALIZED over
    * the lags actually present (which also defines the warm-up rows).
    * Weight_j ∝ (3/4)^j scaled by 4^(L−1): w_j = 3^j·4^(L−1−j), an
    * exact integer; numerator Σ y·w accumulates as decimal(38,0) ↔
    * HUGEINT (y ~ 1e13 micro × w ~ 7e7 × 14 lags ≈ 1e22 > int64), and
    * the ONE division happens at the end on bit-equal integers — the
    * F2/F3 convention. Lags are the previous L OBSERVATIONS (rows,
    * not calendar days): a gap compresses, matching the monitoring
    * use where the series is the unit of memory.
    *
    * Scale shape: fact rows are touched once by the daily aggregate;
    * everything after is |days|·L bounded rows (a decade ≈ 52k) —
    * the contribution fan-out replaces a per-lag weighted window
    * (inexpressible as a plain window sum) with one posexplode +
    * map-side-combinable aggregate.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewmaOf(daily(spark, dir))

  /** [[ewma]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def ewmaOf(series: DataFrame, lags: Int = 14): DataFrame = {
    val wts = ewmaWeights(lags)
    val idx = series.withColumn("i", row_number().over(Window.orderBy("d")))
    val agg = idx
      .select(col("i"), col("y"), posexplode(typedlit(wts)).as(Seq("j", "wt")))
      .groupBy((col("i") + col("j")).as("ti"))
      .agg(sum(col("y").cast("decimal(38,0)") * col("wt")).as("num"),
        sum("wt").as("den"))
    idx.join(agg, col("i") === col("ti"))
      .select(col("d"), col("y").as("y_micro"),
        round(col("num").cast("double") / col("den").cast("double"))
          .cast("long").as("ewma_micro"))
      .withColumn("dev_micro", col("y_micro") - col("ewma_micro"))
      .orderBy("d")
  }

  /** F5: rolling-OLS trend forecast backtest — fit a least-squares
    * line over the trailing 14 observations and forecast the NEXT
    * day, evaluated as a per-day backtest (the linear-trend rung
    * between F1's seasonal-naive and real models; unlike F4's EWMA it
    * extrapolates slope, so it leads into trends instead of lagging
    * them).
    *
    * Exactness: with t = absolute row index, the OLS pieces are plain
    * window sums of (y, t·y, t, t²) over ROWS BETWEEN 14 PRECEDING
    * AND 1 PRECEDING — no per-window recentering, so a vanilla window
    * frame computes everything (the relative-index formulation would
    * need per-frame weights like F4's fan-out). Products accumulate
    * as decimal(38,0) ↔ HUGEINT (t·y ~ 1e13·1e4 and n·Σty overflow
    * int64); slope and forecast assemble in double at the end from
    * bit-equal integers — one division each, the F-family convention.
    * ŷ_t = ȳ + b·(t − t̄) with b = (nΣty − ΣtΣy)/(nΣt² − (Σt)²),
    * both engines evaluating the same expression text shape.
    *
    * Scale: fact rows are touched once by the daily aggregate; the
    * window runs on |days| rows (bounded — the F-family note above).
    */
  def ols(spark: SparkSession, dir: String): DataFrame =
    olsOf(daily(spark, dir))

  /** [[ols]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def olsOf(series: DataFrame, window: Int = 14): DataFrame = {
    val idx = series.withColumn("t",
      row_number().over(Window.orderBy("d")).cast("long"))
    val w = Window.orderBy("t").rowsBetween(-window, -1)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val withSums = idx
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sy", sum(dec(col("y"))).over(w))
      .withColumn("sty", sum(dec(col("t") * col("y"))).over(w))
      .withColumn("st", sum(dec(col("t"))).over(w))
      .withColumn("st2", sum(dec(col("t") * col("t"))).over(w))
      .filter(col("n") >= 8)
    val nd = col("n").cast("double")
    val (sy, sty, st, st2) = (col("sy").cast("double"), col("sty").cast("double"),
      col("st").cast("double"), col("st2").cast("double"))
    val slope = (nd * sty - st * sy) / (nd * st2 - st * st)
    val forecast = sy / nd + slope * (col("t").cast("double") - st / nd)
    withSums
      .select(col("d"), col("y").as("y_micro"),
        round(slope).cast("long").as("slope_micro_per_day"),
        round(forecast).cast("long").as("forecast_micro"))
      .withColumn("abs_err_micro", abs(col("y_micro") - col("forecast_micro")))
      .orderBy("d")
  }

  /** w_j = 3^j · 4^(lags−1−j), j = 0 (current) … lags−1 (oldest). */
  private[graft] def ewmaWeights(lags: Int): Seq[Long] =
    (0 until lags).map(j => (BigInt(3).pow(j) * BigInt(4).pow(lags - 1 - j)).toLong)

  /** F13: Croston intermittent-demand forecast — the method for the
    * series classical smoothing gets WRONG: per-part demand is mostly
    * zero days with occasional spikes, and an EWMA over the calendar
    * series decays toward zero between spikes, while Croston (1972)
    * smooths the DEMAND SIZES and the INTER-DEMAND INTERVALS as two
    * separate series over demand events only, forecasting rate = z/p.
    * The spare-parts / long-tail-SKU standard, and exactly the shape
    * of per-part order flow here (parts order sparsely at every SF).
    *
    * Exactness (F4's truncated-weight contract, per part): both
    * smoothings are the SAME integer-weight expansion over the last
    * `lags` demand EVENTS of each part — w_j = 3^j·4^(lags−1−j) exact
    * longs, sizes in micro-quantity, intervals in micro-days; one
    * rounded double division each (z, p), then one more for the rate,
    * all three expression shapes identical in the DuckDB replay.
    * Event indexing is a per-part window (row_number / lag over the
    * part's own demand days) — fact rows are touched once by the
    * (part, day) aggregate, everything after is events-per-part
    * bounded. Output: the `topK` hottest forecast rates among parts
    * with ≥ `minEvents` demand events, total-order tie-broken.
    */
  def croston(spark: SparkSession, dir: String, lags: Int = 14,
              minEvents: Int = 5, topK: Int = 20): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val demand = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("part"), col("o_orderdate").cast("date").as("d"))
      .agg(sum(round(col("l_quantity") * lit(1e6)).cast("long")).as("q"))
    crostonOf(demand, lags, minEvents, topK)
  }

  /** [[croston]]'s core over ANY (part, d DATE, q micro-long) demand
    * event set.
    */
  private[graft] def crostonOf(demand: DataFrame, lags: Int,
                               minEvents: Int, topK: Int): DataFrame = {
    val w = Window.partitionBy("part").orderBy("d")
    val idx = demand
      .withColumn("i", row_number().over(w))
      .withColumn("gap_micro",
        coalesce(datediff(col("d"), lag("d", 1).over(w)).cast("long"), lit(1L)) * 1000000L)
    val n = idx.groupBy("part").agg(max("i").as("n"))
    val wts = ewmaWeights(lags)
    val sm = idx.join(n, "part")
      .filter(col("n") - col("i") < lags)
      .withColumn("wt", element_at(typedlit(wts), (col("n") - col("i") + 1).cast("int")))
      .groupBy("part", "n")
      .agg(sum(col("q").cast("decimal(38,0)") * col("wt")).as("znum"),
        sum(col("gap_micro").cast("decimal(38,0)") * col("wt")).as("pnum"),
        sum("wt").as("den"))
    val zc = round(col("znum").cast("double") / col("den").cast("double")).cast("long")
    val pc = round(col("pnum").cast("double") / col("den").cast("double")).cast("long")
    sm.filter(col("n") >= minEvents)
      .select(col("part"), col("n").cast("long").as("n_demands"),
        zc.as("z_micro"), pc.as("p_micro"))
      .withColumn("rate_micro",
        round(lit(1e6) * col("z_micro").cast("double") / col("p_micro").cast("double"))
          .cast("long"))
      .orderBy(col("rate_micro").desc, col("part"))
      .limit(topK)
  }

  /** [[cusum]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def cusumOf(series: DataFrame): DataFrame = {
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = series
      .withColumn("cs", sum("y").over(w))
      .withColumn("i", row_number().over(Window.orderBy("d")))
      .crossJoin(series.agg(
        sum("y").as("total"), count(lit(1)).as("n")))
      .withColumn("cusum_micro", col("cs") - col("i") * expr("total div n"))
    base
      .withColumn("rnk", row_number().over(
        Window.orderBy(abs(col("cusum_micro")).desc, col("d"))))
      .select(col("d"), col("y").as("y_micro"), col("cusum_micro"),
        (col("rnk") === 1).as("is_changepoint"))
      .orderBy("d")
  }

  /** F6: seasonal-residual anomaly detection — the robust monitor the
    * F2 decomposition feeds: remove the weekly shape FIRST (per-DOW
    * MEDIAN level — a mean would absorb the very anomalies being
    * hunted), then flag days whose residual exceeds 3·1.4826·MAD of
    * all residuals. A plain z-score monitor (E16) pages every
    * Saturday when weekends run hot; subtracting the DOW level first
    * is what separates "weekend" from "incident", and the
    * median/MAD pair keeps the threshold itself outlier-proof
    * (50% breakdown point vs the mean/σ's 0).
    *
    * Exactness: `percentile_disc(0.5)` is an ORDER statistic — no
    * large sums, engine-identical (the q_mad_outliers idiom);
    * residuals and MAD are exact longs; the one 1.4826 (σ-consistency
    * constant) comparison mirrors on both sides. dow = days since the
    * F2 fixed epoch mod 7 (engine-identical, unlike dayofweek).
    * Scale: fact rows are touched once by the daily aggregate;
    * everything after is |days|-bounded (one per-dow aggregate, one
    * global MAD, one broadcast join-back).
    */
  def residualAnomaly(spark: SparkSession, dir: String): DataFrame =
    residualAnomalyOf(daily(spark, dir))

  /** F8: Theil–Sen robust trend slope — the median of all pairwise
    * slopes (y_j−y_i)/(x_j−x_i): F2's least-squares line has a 0%
    * breakdown point (one bad day drags it arbitrarily), Theil–Sen
    * survives ~29% contamination — the robust-statistics thread
    * (F6/Q40) applied to TREND. The day a revenue backfill doubles a
    * month, LSQ reports a fake trend change; Theil–Sen doesn't.
    *
    * Cost is |days|² PAIRS — days-squared, never corpus-squared
    * (a decade ≈ 6.7M pairs: trivially parallel map work after the
    * daily aggregate touches the facts once). Exactness: slopes are
    * micro-longs via `floor(x+0.5)` on a double division of
    * bit-equal integers (the documented round()/cast trap
    * workarounds), and the median is `percentile_disc` — an order
    * statistic, engine-identical.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSenOf(daily(spark, dir))

  /** [[theilSen]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def theilSenOf(series: DataFrame): DataFrame = {
    val d0 = series.select(
      datediff(col("d"), lit("1995-01-01").cast("date")).cast("long").as("x"),
      col("y"))
    val slopes = d0.as("a").join(d0.as("b"), col("a.x") < col("b.x"))
      .select(floor((col("b.y") - col("a.y")).cast("double") /
        (col("b.x") - col("a.x")) + 0.5).cast("long").as("s"))
    slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s)")
          .cast("long").as("slope_micro_per_day"))
      .crossJoin(broadcast(series.agg(count(lit(1)).as("n_days"))))
      .select(col("n_days"), col("n_pairs"), col("slope_micro_per_day"))
  }

  /** F7: autocorrelation function at lags 1..`maxLag` — the
    * diagnostic that DECIDES the rest of the monitoring stack: a
    * spike at lag 7 justifies F1's seasonal-naive baseline and F6's
    * DOW adjustment; slow decay says trend (fit F2/F5 first);
    * no structure says the EWMA monitor (F4) alone suffices.
    * r_k = Σ d_t·d_{t−k} / Σ d_t² over deviations d = y − mean.
    *
    * Exactness: deviations are exact longs off the FLOOR mean (the F3
    * convention); products d·d ~10²⁶ overflow int64, so terms cast to
    * decimal(38,0) BEFORE multiplying (HUGEINT in DuckDB) and both
    * 128-bit sums stay exact; the one double division per lag runs on
    * bit-equal integers (F2's contract). Lags are observations (row
    * shift via row_number self-join), not calendar days — F4's
    * series-as-memory convention.
    *
    * Scale: fact rows are touched once by the daily aggregate; the
    * lag fan-out is |days|·maxLag bounded rows through one equi-join.
    */
  def acf(spark: SparkSession, dir: String, maxLag: Int = 14): DataFrame =
    acfOf(daily(spark, dir), maxLag)

  /** [[acf]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def acfOf(series: DataFrame, maxLag: Int): DataFrame = {
    val dev = series
      .crossJoin(series.agg(sum("y").as("total"), count(lit(1)).as("n")))
      .select(col("d"), (col("y") - expr("total div n")).as("dev"))
      .withColumn("rn", row_number().over(Window.orderBy("d")))
    val den = dev.agg(
      sum(col("dev").cast("decimal(38,0)") * col("dev")).as("den"))
    dev.select(col("rn"), col("dev"))
      .withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .join(dev.select(col("rn").as("prn"), col("dev").as("pdev")),
        col("prn") === col("rn") - col("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dev").cast("decimal(38,0)") * col("pdev")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("k").cast("int").as("lag"), col("n_pairs"),
        round(col("num").cast("double") * 1e6 / col("den").cast("double"))
          .cast("long").as("acf_micro"))
      .orderBy("lag")
  }

  /** [[residualAnomaly]]'s core over ANY (d DATE, y LONG) series. */
  private[graft] def residualAnomalyOf(series: DataFrame): DataFrame = {
    val d0 = series.select(col("d"), col("y"),
      (((datediff(col("d"), lit("1995-01-01").cast("date")) % 7) + 7) % 7)
        .cast("int").as("dow"))
    val dowMed = d0.groupBy("dow")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY y)")
        .cast("long").as("dow_med"))
    val res = d0.join(dowMed, "dow")
      .withColumn("resid_micro", col("y") - col("dow_med"))
      .withColumn("ad", abs(col("resid_micro")))
    val mad = res.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
        .cast("long").as("mad"))
    res.crossJoin(mad)
      .select(col("d"), col("y").as("y_micro"), col("dow"), col("dow_med"),
        col("resid_micro"), col("mad").as("mad_micro"),
        (col("mad") > 0 &&
          col("ad").cast("double") > lit(3.0) * lit(1.4826) * col("mad").cast("double"))
          .as("is_anomaly"))
      .orderBy("d")
  }

  /** F9: seasonal Mann–Kendall trend test — the DETECTION complement
    * of F8's Theil–Sen slope: is there a monotone trend at all, per
    * weekday, judged by rank statistics immune to outliers and to the
    * weekly cycle (running plain MK across a seasonal series reads
    * the seasonality as trend; the seasonal variant tests within each
    * day-of-week sub-series — Hirsch & Slack 1984, the standard
    * environmental-monitoring formulation). S = Σ_{i<j} sign(y_j −
    * y_i) is a PURE INTEGER pair statistic — the best possible fit
    * for the exact cross-engine replay contract — and the normal
    * approximation z = (S − sgn(S)) / √Var(S), with the tie-corrected
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, uses only
    * IEEE-correctly-rounded ops (one division, one sqrt) on bit-equal
    * integers, so even z hash-matches at micro precision.
    *
    * Scale shape: one fact pass builds the daily series (the family
    * contract); pairs are (|days|/7)² per weekday — |days|-quadratic,
    * never corpus-quadratic (F8's argument: a decade is ~190k pairs
    * per weekday, trivially parallel). Fixed-epoch dow (F2's trap
    * note: engine-native dayofweek origins differ).
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallOf(daily(spark, dir))

  /** [[mannKendall]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def mannKendallOf(base: DataFrame): DataFrame = {
    val d = base.select(col("d"), col("y"),
      (((datediff(col("d"), lit("1995-01-01").cast("date")) % 7) + 7) % 7)
        .cast("long").as("dow"))
    val s = d.as("a").join(d.as("b"),
        col("a.dow") === col("b.dow") && col("a.d") < col("b.d"))
      .groupBy(col("a.dow").as("dow"))
      .agg(sum(when(col("b.y") > col("a.y"), 1L)
        .when(col("b.y") < col("a.y"), -1L).otherwise(0L)).as("s"))
    val n = d.groupBy("dow").agg(count(lit(1)).as("n"))
    val ties = d.groupBy(col("dow"), col("y")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy("dow")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
    n.join(s, Seq("dow"), "left").join(ties, Seq("dow"), "left")
      .select(col("dow"), col("n"), coalesce(col("s"), lit(0L)).as("s"),
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
          - coalesce(col("tie_term"), lit(0L))).as("var18"))
      .withColumn("z_micro",
        when(col("var18") <= 0, lit(0L)).otherwise(
          // continuity-corrected numerator, then ONE division and ONE
          // sqrt on bit-equal integers — IEEE-identical both engines
          floor((when(col("s") > 0, col("s") - 1)
            .when(col("s") < 0, col("s") + 1).otherwise(lit(0L)).cast("double")
            / sqrt(col("var18").cast("double") / lit(18.0))) * 1e6 + 0.5)
            .cast("long")))
      .withColumn("trend",
        when(col("z_micro") >= 1959964L, "increasing")
          .when(col("z_micro") <= -1959964L, "decreasing")
          .otherwise("no_trend"))
      .orderBy("dow")
  }

  /** F11: Brown double exponential smoothing forecast backtest — the
    * trend-following rung between F4's flat EWMA (lags trends) and
    * F5's rolling OLS (refits a window per day): smooth the series
    * once (s1), smooth the smoothed series (s2), and the pair yields
    * level 2·s1−s2 and trend (α/(1−α))·(s1−s2) — a one-step-ahead
    * forecast level+trend that extrapolates without any per-window
    * refitting (Brown 1963, the exponential twin of Holt's method).
    *
    * Exactness: both passes are [[ewmaOf]]'s truncated renormalized
    * integer-weight form (α=1/4, L=14) — s1/s2 are rounded longs that
    * replay bit-equal on any engine; level is exact long arithmetic;
    * trend's one α/(1−α)=1/3 division happens on bit-equal longs in
    * IEEE doubles and rounds to micro (the F2/F3 one-division rule).
    * The forecast for day t uses (s1, s2) strictly at the PREVIOUS
    * observation — a lag, never the current row, so the backtest is
    * leakage-free.
    *
    * Scale shape: two corpus-linear daily aggregates + |days|·L
    * bounded fan-out rows per pass + one window lag over |days| rows
    * — the heavy table is touched exactly once, by pass 1's daily
    * rollup.
    */
  def holt(spark: SparkSession, dir: String): DataFrame =
    holtOf(daily(spark, dir))

  /** F12: fixed-frequency periodogram — the power of the daily series
    * at each candidate period p ∈ [2, 14] days (squared projection
    * onto the cos/sin pair at frequency 1/p), the detector that tells
    * you WHICH cycle a series carries before F2/F10 assume weekly:
    * the dominant period is the argmax, and a flat series has no
    * dominant structure at all. This is the Schuster periodogram
    * restricted to the periods a daily business signal can plausibly
    * carry — a 13-point scan, not an FFT (no power-of-2 padding, no
    * complex shuffle; each period is one conditional projection over
    * the same |days| rows).
    *
    * Exactness: the series is mean-centered with an exact integer
    * floor-mean (y ≥ 0, no div-vs-// hazard); cos/sin are evaluated
    * at 2π·(t mod p)/p — the small argument keeps libm agreement —
    * and MICRO-ROUNDED per term before the exact decimal(38,0) sums
    * (the adamic-adar ln convention: one rounded transcendental per
    * term, then integer arithmetic); the final normalization is two
    * divisions and two multiplies on bit-equal integers, IEEE-
    * identical on both engines. Scale shape: one daily rollup over
    * the fact table, then |days|·13 bounded fan-out rows into one
    * map-side-combinable aggregate.
    */
  def periodogram(spark: SparkSession, dir: String): DataFrame =
    periodogramOf(daily(spark, dir))

  /** [[periodogram]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def periodogramOf(series: DataFrame,
                                   periods: Seq[Int] = (2 to 14)): DataFrame = {
    val twoPi = 6.283185307179586
    val idx = series
      .withColumn("t", row_number().over(Window.orderBy("d")) - 1)
    val stats = idx.agg(sum("y").as("sy"), count(lit(1)).as("n"))
    val terms = idx.crossJoin(broadcast(stats))
      .withColumn("yc", col("y") - expr("sy div n"))
      .select(col("yc"), col("n"), col("t"),
        explode(typedlit(periods)).as("p"))
      .withColumn("th", pmod(col("t"), col("p")) * lit(twoPi) / col("p"))
      .withColumn("c", round(cos(col("th")) * 1e6).cast("long"))
      .withColumn("s", round(sin(col("th")) * 1e6).cast("long"))
    val proj = terms.groupBy("p")
      .agg(
        sum(col("yc").cast("decimal(38,0)") * col("c")).as("cc"),
        sum(col("yc").cast("decimal(38,0)") * col("s")).as("ss"),
        max("n").as("n"))
      .select(col("p"),
        (col("cc").cast("double") / col("n") / lit(1e12)).as("cd"),
        (col("ss").cast("double") / col("n") / lit(1e12)).as("sd"))
      .select(col("p").cast("long").as("period"),
        (col("cd") * col("cd") + col("sd") * col("sd")).as("spec_power"))
    proj
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("spec_power").desc, col("period"))))
      // a flat series mean-centers to zero power everywhere — then NO
      // period is dominant (the argmax alone would install a spurious
      // period-2 cycle on ties-at-zero)
      .select(col("period"), col("spec_power"),
        (col("rnk") === 1 && col("spec_power") > 0.0).as("dominant"))
      .orderBy("period")
  }

  /** F14: Holt–Winters additive-seasonal forecast backtest — the
    * seasonal rung above F11: Brown's level+trend alone lags a weekly
    * cycle by construction (the smoothed level averages across the
    * cycle), and F1's seasonal-naive carries no trend at all; the
    * additive-seasonal form forecasts level + trend + seasonal, the
    * standard triple for a trending series with a stable weekly shape
    * (Winters 1960, the additive variant of Holt–Winters).
    *
    * Decomposition discipline (the fully-coupled textbook recursion
    * is order-dependent and replays nowhere): the seasonal component
    * for day t is the FLOOR-mean of that day-of-week's previous
    * `seasonK` observations — a trailing per-dow window, strictly
    * past data, leakage-free by construction; the deseasonalized
    * residual y − s then runs F11's EXACT Brown pass (two truncated
    * renormalized integer-weight smoothings), and the forecast is
    * lag(level) + lag(trend) + s. Every piece replays bit-equal: dow
    * from the F2 fixed epoch mod 7 (engine-identical, unlike
    * dayofweek), the seasonal floor-mean is `div` on nonnegative
    * longs (no div-vs-// hazard), s1/s2 are [[ewmaOf]]'s rounded
    * longs, and trend's one /3.0 division can never land on a .5
    * boundary (integer/3.0 has fractional part ∈ {0,⅓,⅔}).
    *
    * Scale shape: one daily rollup touches the fact table; the per-dow
    * trailing window, both smoothing passes (|days|·L bounded fan-out)
    * and the final lag all run on |days| rows — the F-family
    * deliberately-bounded tail. Warm-up rows (fewer than `seasonK`
    * prior same-dow observations) have no seasonal estimate and are
    * excluded from the backtest, exactly as F5 excludes n<8 windows.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame =
    holtWintersOf(daily(spark, dir))

  /** [[holtWinters]]'s core over ANY (d DATE, y LONG ≥ 0) daily
    * series — split out so specs can feed hand series (a pure
    * trend+weekly-cycle series must backtest near-exactly once the
    * seasonal window is warm).
    */
  private[graft] def holtWintersOf(series: DataFrame, seasonK: Int = 4): DataFrame = {
    val dowW = Window.partitionBy("dow").orderBy("d").rowsBetween(-seasonK, -1)
    val withS = series
      .withColumn("dow",
        pmod(datediff(col("d"), lit("1995-01-01").cast("date")), lit(7)))
      .withColumn("sn", count(lit(1)).over(dowW))
      .withColumn("ssum", sum("y").over(dowW))
      .filter(col("sn") === seasonK)
      .withColumn("seasonal_micro", expr("ssum div sn"))
      .select("d", "y", "seasonal_micro")
    val p1 = ewmaOf(withS.select(col("d"), (col("y") - col("seasonal_micro")).as("y")))
      .select(col("d"), col("ewma_micro").as("s1"))
    val p2 = ewmaOf(p1.select(col("d"), col("s1").as("y")))
      .select(col("d"), col("ewma_micro").as("s2"))
    val w = Window.orderBy("d")
    withS.join(p1, "d").join(p2, "d")
      .withColumn("level", lit(2L) * col("s1") - col("s2"))
      .withColumn("trend",
        round((col("s1") - col("s2")).cast("double") / lit(3.0)).cast("long"))
      .withColumn("forecast_micro",
        lag("level", 1).over(w) + lag("trend", 1).over(w) + col("seasonal_micro"))
      .filter(col("forecast_micro").isNotNull)
      .select(col("d"), col("y").as("y_micro"), col("seasonal_micro"),
        col("forecast_micro"),
        abs(col("y") - col("forecast_micro")).as("abs_err_micro"))
      .orderBy("d")
  }

  /** [[holt]]'s core over ANY (d DATE, y LONG) daily series. */
  private[graft] def holtOf(series: DataFrame): DataFrame = {
    val p1 = ewmaOf(series)
      .select(col("d"), col("y_micro"), col("ewma_micro").as("s1"))
    val p2 = ewmaOf(p1.select(col("d"), col("s1").as("y")))
      .select(col("d"), col("ewma_micro").as("s2"))
    val w = Window.orderBy("d")
    p1.join(p2, "d")
      .withColumn("level", lit(2L) * col("s1") - col("s2"))
      .withColumn("trend",
        round((col("s1") - col("s2")).cast("double") / lit(3.0)).cast("long"))
      .withColumn("forecast_micro",
        lag("level", 1).over(w) + lag("trend", 1).over(w))
      .filter(col("forecast_micro").isNotNull)
      .select(col("d"), col("y_micro"), col("forecast_micro"),
        abs(col("y_micro") - col("forecast_micro")).as("abs_err_micro"))
      .orderBy("d")
  }
}
