package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{ContentMetrics, Windows}
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators._
import graft.schema.{DeliveryLogLite, JoinSideEvent, ScopedEvent}
import graft.streaming.{CombineDeliveryLog, InferredJoin}
import GateSupport._
import CatalogDefs._

/** Time series: smoothing, forecasts, changepoints, acf, drift monitors, matrix profile.
  *
  * 32 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object TimeSeriesGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Time series: EWMA forecast residuals (Roberts control chart) — a
    // pinned per-key left fold of exact IEEE ops, so even the raw double
    // smoothed value hash-gates; the newest point flags when it misses
    // the prefix forecast by more than the band.
    "q75_ewma" -> ((s, dir) =>
      operators.Anomaly.ewmaResiduals(ev(s, dir).where(col("user_id") < 50),
        "user_id", "ts_ms", "value", alpha = 0.2, band = 60.0)),

    // One-sided CUSUM drift monitor per user: accumulated above-baseline
    // deviation via the two-window prefix form (running sum − clipped
    // running min) — no fold, no collected series.
    "q102_cusum_drift" -> ((s, dir) =>
      operators.Anomaly.cusumDrift(
        ev(s, dir).select(col("user_id"), col("ts_ms"), col("value")),
        "user_id", "ts_ms", "value",
        slackE6 = 5000000L, thresholdE6 = 500000000L)),

    // Per-type daily revenue trend: OLS slope/intercept as exact
    // integer sufficient-statistic ratios; x is the day index rebased
    // near zero so every product stays in 64 bits.
    "q148_daily_trend" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"),
          expr("ts_ms div 86400000 - 19700").as("day_x"))
        .agg(sum(cents(col("value"))).as("y_cents"))
      Trend.groupedOls(daily, Seq("event_type"), col("day_x"),
        col("y_cents"))
    }),

    // Revenue half-life: the day by which half of each type's revenue
    // had accrued — weighted median of time by money, census-windowed.
    "q162_revenue_halflife" -> ((s, dir) =>
      ExactQuantiles.weightedHalfPoint(
        ev(s, dir).select(col("event_type"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"),
          cents(col("value")).as("c")),
        Seq("event_type"), col("day_ms"), col("c"))
        .withColumnRenamed("n_cells", "n_days")
        .withColumnRenamed("total_weight", "total_cents")
        .withColumnRenamed("half_point", "half_day_ms")),

    // Exact change-point finder: the day boundary maximizing the
    // two-sample KS numerator between before/after value distributions
    // — all work on the days × values grid, never the raw rows.
    "q164_changepoint" -> ((s, dir) =>
      operators.Drift.changePoint(
        ev(s, dir).select(
          (col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"),
          cents(col("value")).as("c")),
        col("day_ms"), col("c"))),

    // Time-weighted average (the step-function integral — "average
    // concurrent value"): per event_type, Σ valueᵢ·(tᵢ₊₁−tᵢ) over each
    // user's event sequence as an exact integer pair (area, span).
    "q178_time_weighted" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          col("event_type"), cents(col("value")).as("c"))
        .withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
        .where(col("next_ts").isNotNull)
        // second-granularity integers: cents × ms would sit within 10×
        // of Long.Max at sf0.1 already — no headroom at real scale
        .withColumn("gap_s", expr("(next_ts - ts_ms) div 1000"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("c") * col("gap_s")).as("area_cents_s"),
          sum(col("gap_s")).as("span_s"))
        .withColumn("twa_cents", expr("area_cents_s div span_s"))
    }),

    // Recency-weighted engagement: per-user exponentially decayed score
    // (1-week half-life, pinned as-of instant) — per-event contributions
    // round to micro-units BEFORE the integer sum, so the freshness
    // feature hash-gates under any partitioning.
    "q133_decayed_score" -> ((s, dir) =>
      agg.Windows.decayedScore(ev(s, dir), Seq("user_id"), "ts_ms",
        halfLifeMs = 604800000L, asOfMs = 1706745600000L)),

    // Trending risers per sliding window: top-5 users by count delta vs
    // the window one slide back — slice counts re-aggregate into window
    // counts, previous-window counts arrive by a shifted self-join, the
    // rank rides WindowGroupLimit.
    "q127_trending" -> ((s, dir) =>
      agg.Windows.trendingTopK(ev(s, dir), col("user_id"), col("ts_ms"),
        sliceMs = 3600000L, slicesPerWindow = 6, topK = 5)),

    // PSI drift report between the month's two halves: bins from the
    // REFERENCE half's exact deciles, per-bin (p_t − p_r)·ln(p_t/p_r) in
    // pinned micro-units — the feature-drift monitor (stationary target
    // ⇒ ≈ 0 by construction; per-bin terms localize moved mass).
    "q124_psi_drift" -> ((s, dir) => {
      val e = ev(s, dir).select(cents(col("value")).as("x"),
        col("event_id").as("key"), col("ts_ms"))
      val split = 1705363200000L // 2024-01-16T00:00:00Z, the month's midpoint
      operators.Drift.psiBins(e.where(col("ts_ms") < split),
        e.where(col("ts_ms") >= split), col("x"), col("key"), buckets = 10)
    }),

    // Seasonal-naive residuals: each event minus the user's latest value
    // one day earlier (2h staleness tolerance) — ONE range-frame window
    // pass (max of (ts, id, value) struct = latest-ts/largest-id
    // deterministic pick), no self-join, no gap-fill.
    "q118_seasonal_residual" -> ((s, dir) =>
      operators.Anomaly.seasonalResiduals(
        ev(s, dir).select(col("user_id"), col("event_id"), col("ts_ms"),
          cents(col("value")).as("v")),
        "user_id", "event_id", "ts_ms", "v",
        periodMs = 86400000L, toleranceMs = 7200000L)
        .where(col("baseline_ts").isNotNull)),

    // SAX words: per-user value series → 4 equal-count PAA segments →
    // cents-breakpoint symbols (cross-multiplied, division-free) →
    // one word per user.
    "q186_sax" -> ((s, dir) =>
      operators.Trend.saxWords(
        ev(s, dir).withColumn("v", cents(col("value"))),
        Seq("user_id"), Seq(col("ts_ms"), col("event_id")), col("v"),
        segments = 4, breakpoints = Seq(2500L, 5000L, 7500L))),

    // Holt double-exponential forecast of daily revenue per event type:
    // α=0.2, β=0.3 as integer ratios, every smoothing step truncated to
    // cents before the next — the whole recursion BIGINT, the 7-day
    // forecast hash-exact. The oracle refolds the same series with
    // list_reduce.
    "q226_holt_forecast" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Trend.holtLinear(daily, Seq("event_type"), col("day"),
        col("cents"), alphaNum = 2, betaNum = 3, den = 10, horizon = 7)
    }),

    // Holt–Winters additive triple smoothing over the same daily revenue
    // series as q226, weekly cycle m=7: level+trend+rotating seasonal
    // queue folded in pure BIGINT (α=0.3, β=0.1, γ=0.2 as integer
    // ratios). The oracle refolds with the state flattened into one
    // BIGINT list [l, b, s1..s7].
    "q229_holt_winters" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Trend.holtWinters(daily, Seq("event_type"), col("day"),
        col("cents"), m = 7, alphaNum = 3, betaNum = 1, gammaNum = 2,
        den = 10)
    }),

    // Theil–Sen robust daily-revenue slope per event type: the median of
    // all 435 pairwise slopes, kept as an exact rational with a
    // deterministic lower-median tie-break; one spiked day cannot drag
    // it (contrast q116's OLS trend, which it complements).
    "q230_theil_sen" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Trend.theilSen(daily, Seq("event_type"), col("day"),
        col("cents"))
    }),

    // Classical additive decomposition of daily revenue per event type:
    // centered 7-day MA trend, phase-mean seasonal indices (centered to
    // ~0), remainder by exact subtraction — y = T + S + R holds
    // bit-exactly on every emitted row.
    "q231_decompose" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Trend.classicalDecompose(daily, Seq("event_type"),
        col("day"), col("cents"), m = 7)
    }),

    // Linear-interpolation gap fill: every 5th day knocked out of the
    // daily revenue series, then rebuilt by exact integer interpolation
    // between its bracketing observations (contrast q67's step-function
    // forward fill).
    "q232_linear_fill" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .where(pmod(col("day"), lit(5L)) =!= 2L)
        .withColumn("ts_ms", col("day") * 86400000L)
      operators.GapFill.linearFill(daily, "event_type", "ts_ms", "cents",
        bucketMs = 86400000L)
    }),

    // Exact isotonic calibration: purchase rate over value-score bins
    // fitted to the best monotone curve via the minimax closed form —
    // e6 truncation BEFORE min/max commutes (monotone), so the fit is
    // engine-exact with no PAV loop anywhere.
    "q233_isotonic" -> ((s, dir) => {
      val bins = t(s, dir, "events")
        .withColumn("bin",
          least(floor(col("value") / 50).cast("long"), lit(9L)))
        .groupBy(col("bin"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("s"), count(lit(1)).as("c"))
        .withColumn("grp", lit("all"))
      operators.Isotonic.isotonicFit(bins, Seq("grp"), "bin", "s", "c")
    }),

    // Maximum drawdown of the daily revenue level per event type — the
    // worst peak-to-trough collapse, with the day it bottomed and the
    // peak it fell from (q102's CUSUM flags drift onset; this measures
    // total damage). Running-max + pick windows, one exchange.
    "q248_drawdown" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Trend.maxDrawdown(daily, Seq("event_type"), col("day"),
        col("cents"))
    }),

    // Exact ACF at lags 1..7 of the daily revenue level per event type —
    // measures which lag actually rings instead of ASSUMING the weekly
    // cycle q118/q229/q231 hard-code (their m=7 is exactly the lag this
    // readout should spike at). Equi-join lag pairing, n² scaling,
    // DECIMAL(38,0) quadratics.
    "q251_acf" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      decStr(operators.Trend.acfSuffStats(daily, Seq("event_type"),
        col("day"), col("cents"), maxLag = 7))
    }),

    // Rolling 7-day OLS slope of daily revenue per event type — the
    // LOCAL trend readout (q116's global slope averages a regime change
    // away; this one shows it). Five running sums share one sort.
    "q254_rolling_ols" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      decStr(operators.Trend.rollingOls(daily, Seq("event_type"),
        col("day"), col("cents"), window = 7))
    }),

    // LTTB dashboard downsampling: daily per-type revenue series →
    // the visually-optimal 12-point polyline per series; sequential
    // per series (prev pick is a triangle vertex), parallel across
    // series, centroid division eliminated by n₃-scaled exact areas.
    "q283_lttb" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Lttb.downsample(daily, col("event_type"), col("day"),
          col("cents"), buckets = 10)
        .select(col("series").as("event_type"), col("x").as("day"),
          col("y").as("cents"))
    }),

    // Walk-forward forecast backtest: for every day with a full 7-day
    // trailing window, fit the q254 OLS on days t−7..t−1 (running sums
    // off one sort, no refit loop), predict ŷ(t) as an exact rational
    // num/den (den = 7·(7Σx²−(Σx)²) > 0 for distinct days), score
    // |actual·den − num|·10⁶ div den — per-day e6-truncated absolute
    // error rolled into MAE. The honest out-of-sample eval a forecast
    // family (q226/q229/q254) needs before anyone trusts it.
    "q289_forecast_backtest" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("x"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val w7 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("x"))
        .rowsBetween(-7, -1)
      daily
        .withColumn("n", count(lit(1)).over(w7))
        .withColumn("sx", sum(col("x")).over(w7))
        .withColumn("sy", sum(col("y")).over(w7))
        .withColumn("sxx", sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w7))
        .withColumn("sxy", sum(expr("CAST(x AS DECIMAL(38,0)) * y")).over(w7))
        .where(col("n") === 7)
        .withColumn("sn", expr("7 * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
        .withColumn("sd", expr("7 * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("num", expr(
          "CAST(sy AS DECIMAL(38,0)) * sd + sn * (7 * x - sx)"))
        .withColumn("den", expr("7 * sd"))
        .withColumn("abs_err_e6", expr(
          """CAST(abs(CAST(y AS DECIMAL(38,0)) * den - num) * 1000000
             div den AS BIGINT)"""))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          expr("CAST(sum(CAST(abs_err_e6 AS DECIMAL(38,0))) div count(1) AS BIGINT)")
            .as("mae_e6"))
    }),

    // Trend monitoring: Mann–Kendall over per-type daily revenue — the
    // nonparametric drift gate (S statistic, tie-corrected variance,
    // sqrt-free significance) on the calendar-bounded grid.
    "q299_mann_kendall" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"),
          expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      operators.Drift.mannKendall(daily, "event_type", "day", "cents")
    }),

    // Lead–lag cross-correlation between the daily view and purchase
    // revenue series (lags 0–7): exact Pearson pieces per lag + the
    // pinned two-root e6 correlation — "do purchases follow views,
    // and by how many days".
    "q380_lead_lag" -> ((s, dir) => {
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      decStr(operators.Trend.crossCorrE6(
        daily.where(col("event_type") === "view"), col("day"),
        col("cents"),
        daily.where(col("event_type") === "purchase"), col("day"),
        col("cents"), maxLag = 7))
    }),

    // Newey–West long-run variance components of the daily revenue
    // series (Bartlett kernel, L = 5): the autocorrelation-robust
    // error bar for time-sliced readouts, lag structure emitted
    // per-row like q380.
    "q395_newey_west" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(expr(
          "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
          .as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
      decStr(operators.Trend.neweyWestE12(daily, col("day"),
        col("day_cents"), maxLag = 5))
    }),

    // Durbin–Watson serial-correlation statistic (Durbin & Watson
    // 1950) on the residuals of daily revenue ~ day: DW ≈ 2 under
    // independent errors, → 0 under positive autocorrelation — the
    // screen that says whether q254/q395's robust errors are needed.
    // Exact integer moments, per-residual pinned e3 rounding, pure
    // integer DW ratio.
    "q451_durbin_watson" -> ((s, dir) =>
      operators.Trend.durbinWatsonE6(t(s, dir, "lineitem"),
        expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000"),
        cents(col("l_extendedprice")))),

    // Trend/seasonal strength (tsfeatures F_T/F_S) of the daily
    // revenue series per return flag over the q231 classical
    // decomposition — "is there actually a trend / weekly cycle".
    "q400_seasonal_strength" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), expr(
          "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
          .as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("cents"))
      operators.Trend.seasonalStrengthE6(
        operators.Trend.classicalDecompose(daily, Seq("l_returnflag"),
          col("day"), col("cents"), m = 7),
        Seq("l_returnflag"))
    }),

    // Taylor's power law across parts: variance ≈ a·mean^b of
    // quantities — the cross-group fluctuation-scaling exponent that
    // completes the Zipf/Hill/Heaps power-law family.
    "q422_taylors_law" -> ((s, dir) =>
      decStr(operators.Dispersion.taylorsLawE6(t(s, dir, "lineitem"),
        col("l_partkey"), round(col("l_quantity")).cast("long")))),

    // Hurst exponent (R/S) of the daily revenue series at window
    // sizes 8/16/32/64: long-range dependence — persistent trending
    // vs memoryless — beside q251's single-scale ACF.
    "q423_hurst" -> ((s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(expr(
          "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
          .as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("cents"))
      operators.Trend.hurstRsE6(daily, col("day"), col("cents"),
        windows = Seq(8, 16, 32, 64))
    }),

    // Matrix-profile motif/discord discovery over per-type daily-count
    // series: every length-4 window's nearest other window (trivial
    // matches excluded) by EXACT integer squared distance — low profile
    // = repeated structure (motifs), high = discords, the anomaly probe
    // the drift family (q102/q164/q305) doesn't cover. Windows build as
    // m−1 leads in one pass (no explode); the quadratic step joins on
    // the key only, so many-keys/bounded-series parallelizes flat.
    "q330_matrix_profile" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(count(lit(1)).as("n"))
      operators.Motif.nearestWindow(daily, Seq("event_type"),
        col("day"), col("n"), m = 4)
    }),

    // Page–Hinkley drift detector (Page 1954; Hinkley 1971) over daily
    // revenue per type: deviations from the RUNNING mean accumulate,
    // PH_t = U_t − min_{i≤t} U_i alarms when the level shifts — the
    // classic sequential change detector CUSUM (q102) approximates
    // with a fixed reference. All-window composition on the calendar
    // grid, e6 integer deviations (running mean truncated before the
    // subtraction), λ = 2× the series mean.
    "q305_page_hinkley" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("x"))
      val order = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val run = order.rowsBetween(Window.unboundedPreceding, 0)
      val all = Window.partitionBy(col("event_type"))
      val scored = daily
        .withColumn("i", row_number().over(order).cast("long"))
        .withColumn("cumx", sum(col("x")).over(run))
        .withColumn("dev",
          col("x") * lit(1000000L) - expr("cumx * 1000000L div i"))
        .withColumn("u", sum(col("dev")).over(run))
        .withColumn("ph", col("u") - min(col("u")).over(run))
        .withColumn("tot", sum(col("x")).over(all))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("alarm", col("ph") > expr("2 * (tot * 1000000L div n)"))
      scored.groupBy(col("event_type"))
        .agg(max(col("n")).as("n_days"),
          max(struct(col("ph"), (-col("day")).as("nd"))).as("k"),
          min(when(col("alarm"), col("day"))).as("first_alarm_day"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"))
        .select(col("event_type"), col("n_days"),
          col("k.ph").as("ph_max_e6"), (-col("k.nd")).as("ph_argmax_day"),
          col("first_alarm_day"), col("n_alarms"))
    }),

    // Croston intermittent-demand forecast: the %17 user slice makes
    // per-type daily demand genuinely gappy at sf0.01; size/interval SES
    // over occurrences only (zero days never materialize — the sparse
    // series IS the data), rate as one e6 integer ratio.
    "q303_croston" -> ((s, dir) => {
      val daily = ev(s, dir)
        .where(col("user_id") % 17 === 3)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(count(lit(1)).as("q"))
      operators.Trend.croston(daily, Seq("event_type"), col("day"),
        col("q"), alphaNum = 2, den = 10)
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // The two-window prefix form replayed verbatim: running deviation sum,
    // clipped running min, S = P − min(0, min P). All-BIGINT arithmetic.
    "q102_cusum_drift" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
        |  CAST(round(value * 1000000) AS BIGINT) AS v_e6 FROM events),
        |m AS (SELECT user_id, ts_ms, v_e6,
        |  sum(v_e6) OVER (PARTITION BY user_id)
        |    // count(*) OVER (PARTITION BY user_id) AS mu FROM e),
        |pp AS (SELECT user_id, ts_ms, v_e6,
        |  sum(v_e6 - mu - 5000000) OVER (PARTITION BY user_id
        |    ORDER BY ts_ms, v_e6
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p FROM m),
        |ps AS (SELECT user_id, ts_ms,
        |  p - least(min(p) OVER (PARTITION BY user_id ORDER BY ts_ms, v_e6
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s
        | FROM pp)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |  CAST(max(s) AS BIGINT) AS max_s_e6,
        |  CAST(sum(CASE WHEN s > 500000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(coalesce(min(CASE WHEN s > 500000000 THEN ts_ms END), -1) AS BIGINT)
        |    AS first_alarm_ts
        |FROM ps GROUP BY 1""".stripMargin,

    // q148: the same five integer sums and ratio numerators.
    "q148_daily_trend" ->
      """WITH d AS (SELECT event_type,
        |  epoch_ms(ts) // 86400000 - 19700 AS x,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS y
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(count(*) * sum(x*y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
        |  CAST(count(*) * sum(x*x) - sum(x) * sum(x) AS BIGINT) AS slope_den,
        |  CAST(sum(y) * sum(x*x) - sum(x) * sum(x*y) AS BIGINT) AS intercept_num
        |FROM d GROUP BY 1""".stripMargin,

    // q162: daily census, cumulative vs doubled total, min qualifying day.
    "q162_revenue_halflife" ->
      """WITH d AS (SELECT event_type,
        |  epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS c
        | FROM events GROUP BY 1, 2),
        |w AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY day_ms
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(c) OVER (PARTITION BY event_type) AS total,
        |  count(*) OVER (PARTITION BY event_type) AS nd FROM d)
        |SELECT event_type, CAST(max(nd) AS BIGINT) AS n_days,
        |  CAST(max(total) AS BIGINT) AS total_cents,
        |  CAST(min(day_ms) AS BIGINT) AS half_day_ms
        |FROM w WHERE 2 * cum >= total GROUP BY 1""".stripMargin,

    // q164: the same census → boundary grid → per-split integer KS,
    // (d desc, t, v) argmax.
    "q164_changepoint" ->
      """WITH e AS (SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day,
        |  CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |c AS (SELECT day, v, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT DISTINCT day AS t FROM c
        |      WHERE day > (SELECT min(day) FROM c)),
        |vals AS (SELECT DISTINCT v FROM c),
        |tot AS (SELECT v, sum(n) AS cnt FROM c GROUP BY 1),
        |tv AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cumT,
        |  sum(cnt) OVER () AS nTotal FROM tot),
        |cb AS (SELECT b.t, c.v, sum(c.n) AS nb FROM b JOIN c ON c.day < b.t
        |       GROUP BY 1, 2),
        |grid AS (SELECT b.t, vals.v, coalesce(cb.nb, 0) AS nb
        |  FROM b CROSS JOIN vals
        |  LEFT JOIN cb ON cb.t = b.t AND cb.v = vals.v),
        |cum AS (SELECT t, v,
        |  sum(nb) OVER (PARTITION BY t ORDER BY v) AS cumB FROM grid),
        |nb2 AS (SELECT *, max(cumB) OVER (PARTITION BY t) AS nB FROM cum),
        |d AS (SELECT nb2.t, nb2.v, nB, nTotal,
        |  abs(cumB * (nTotal - nB) - (cumT - cumB) * nB) AS dd
        | FROM nb2 JOIN tv ON tv.v = nb2.v),
        |r AS (SELECT *, row_number() OVER (ORDER BY dd DESC, t, v) AS rk
        |      FROM d)
        |SELECT t AS split_bucket, CAST(nB AS BIGINT) AS n_before,
        |  CAST(nTotal - nB AS BIGINT) AS n_after,
        |  CAST(dd AS BIGINT) AS d_num, v AS at_value
        |FROM r WHERE rk = 1""".stripMargin,

    // q178: one lead per user, second-granularity integer areas.
    "q178_time_weighted" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts,
        |  event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |l AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id) AS next_ts FROM e),
        |g AS (SELECT event_type, c, (next_ts - ts) // 1000 AS gap_s
        |      FROM l WHERE next_ts IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(c * gap_s) AS BIGINT) AS area_cents_s,
        |  CAST(sum(gap_s) AS BIGINT) AS span_s,
        |  CAST(sum(c * gap_s) // sum(gap_s) AS BIGINT) AS twa_cents
        |FROM g GROUP BY 1""".stripMargin,

    // q133: identical per-event pow(2, −age/hl) micro-unit rounding,
    // integer-summed.
    "q133_decayed_score" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(pow(2.0,
        |    -((1706745600000 - epoch_ms(ts)) / 604800000.0))
        |    * 1000000.0) AS BIGINT)) AS BIGINT) AS score_e6
        |FROM events WHERE epoch_ms(ts) <= 1706745600000
        |GROUP BY user_id""".stripMargin,

    // q127: window counts, shifted self-join for the previous window,
    // (delta desc, key) rank ≤ 5.
    "q127_trending" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key,
        |  epoch_ms(ts) - epoch_ms(ts) % 3600000 AS slice FROM events),
        |x AS (SELECT key, slice - k.k * 3600000 AS w
        |      FROM e, (SELECT unnest(range(0, 6)) AS k) k(k)),
        |g AS (SELECT w, key, CAST(count(*) AS BIGINT) AS n
        |      FROM x GROUP BY 1, 2),
        |j AS (SELECT g.w, g.key, g.n,
        |  g.n - coalesce(p.n, 0) AS delta
        | FROM g LEFT JOIN g p ON p.key = g.key AND p.w = g.w - 3600000),
        |r AS (SELECT *, row_number() OVER (PARTITION BY w
        |  ORDER BY delta DESC, key) AS rk FROM j)
        |SELECT w AS window_start_ms, key, n, CAST(delta AS BIGINT) AS delta,
        |  CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5""".stripMargin,

    // q124: reference-decile cuts by rank selection, collapse-left bins
    // on both halves, the identical pinned double pipeline per bin.
    "q124_psi_drift" ->
      """WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS x,
        |  event_id AS key, epoch_ms(ts) AS ts_ms FROM events),
        |ref AS (SELECT * FROM e WHERE ts_ms < 1705363200000),
        |tgt AS (SELECT * FROM e WHERE ts_ms >= 1705363200000),
        |n AS (SELECT count(*) AS c FROM ref),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, key) AS rn FROM ref),
        |cuts AS (SELECT r.x AS cut FROM r, n
        | WHERE r.rn IN (SELECT (n.c*b + 9)//10
        |   FROM (SELECT unnest(range(1, 10)) AS b) bb(b), n)),
        |br AS (SELECT 1 + (SELECT count(*) FROM cuts WHERE cut < x) AS bucket
        |       FROM ref),
        |bt AS (SELECT 1 + (SELECT count(*) FROM cuts WHERE cut < x) AS bucket
        |       FROM tgt),
        |cr AS (SELECT bucket, count(*) AS n_ref FROM br GROUP BY 1),
        |ct AS (SELECT bucket, count(*) AS n_tgt FROM bt GROUP BY 1),
        |j AS (SELECT coalesce(cr.bucket, ct.bucket) AS bucket,
        |  coalesce(n_ref, 0) AS n_ref, coalesce(n_tgt, 0) AS n_tgt
        | FROM cr FULL JOIN ct ON cr.bucket = ct.bucket),
        |tot AS (SELECT (SELECT count(*) FROM ref) AS nr,
        |  (SELECT count(*) FROM tgt) AS nt)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(n_ref AS BIGINT) AS n_ref,
        |  CAST(n_tgt AS BIGINT) AS n_tgt,
        |  CAST(round((greatest(CAST(n_tgt AS DOUBLE)/CAST(nt AS DOUBLE), 1e-6)
        |    - greatest(CAST(n_ref AS DOUBLE)/CAST(nr AS DOUBLE), 1e-6))
        |   * ln(greatest(CAST(n_tgt AS DOUBLE)/CAST(nt AS DOUBLE), 1e-6)
        |     / greatest(CAST(n_ref AS DOUBLE)/CAST(nr AS DOUBLE), 1e-6))
        |   * 1000000.0) AS BIGINT) AS psi_term_e6
        |FROM j, tot""".stripMargin,

    // q118: the same latest-in-[t−period−tol, t−period] baseline via a
    // struct-max range frame — (ts, id, value) lexicographic max IS the
    // latest-ts/largest-id deterministic pick.
    "q118_seasonal_residual" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |b AS (SELECT user_id, event_id, ts_ms, v,
        |  max(struct_pack(ts := ts_ms, id := event_id, vv := v))
        |   OVER (PARTITION BY user_id ORDER BY ts_ms
        |    RANGE BETWEEN 93600000 PRECEDING AND 86400000 PRECEDING) AS bl
        | FROM e)
        |SELECT user_id, event_id, ts_ms, v,
        |  bl.ts AS baseline_ts, bl.vv AS baseline_value,
        |  v - bl.vv AS residual
        |FROM b WHERE bl.ts IS NOT NULL""".stripMargin,

    // list_reduce replays the identical left fold (init = first element,
    // acc first); (1.0 - 0.2) is spelled as the subtraction — double(0.8)
    // is a different double
    "q75_ewma" ->
      """WITH e AS (
        | SELECT user_id AS k, epoch_ms(ts) AS ts, value AS v
        | FROM events WHERE user_id < 50),
        |l AS (SELECT k, list(v ORDER BY ts, v) AS vs,
        |  CAST(count(*) AS BIGINT) AS n_obs FROM e GROUP BY k),
        |f AS (SELECT k, n_obs, vs[len(vs)] AS last_value,
        |  list_reduce(vs, (acc, x) -> 0.2 * x + (1.0 - 0.2) * acc) AS ewma,
        |  CASE WHEN n_obs >= 2 THEN
        |    vs[len(vs)] - list_reduce(vs[1: len(vs)-1],
        |      (acc, x) -> 0.2 * x + (1.0 - 0.2) * acc)
        |  END AS residual
        | FROM l)
        |SELECT k AS user_id, n_obs, ewma, last_value, residual,
        | coalesce(abs(residual) > 60.0, false) AS is_spike
        |FROM f""".stripMargin,

    // q186: same (ts, event_id) total order, integer segment id,
    // cross-multiplied cents breakpoints, ordered word assembly.
    "q186_sax" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |   CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |r AS (SELECT user_id, v, row_number() OVER (PARTITION BY user_id
        |   ORDER BY ts_ms, event_id) AS rn,
        |   count(*) OVER (PARTITION BY user_id) AS n FROM e),
        |seg AS (SELECT user_id, (rn - 1) * 4 // n AS sg, sum(v) AS s,
        |   count(*) AS m FROM r GROUP BY 1, 2),
        |sym AS (SELECT user_id, sg, m,
        |   CASE WHEN s >= 7500 * m THEN 'd' WHEN s >= 5000 * m THEN 'c'
        |        WHEN s >= 2500 * m THEN 'b' ELSE 'a' END AS sym FROM seg)
        |SELECT user_id, CAST(sum(m) AS BIGINT) AS n,
        | string_agg(sym, '' ORDER BY sg) AS sax_word
        |FROM sym GROUP BY 1""".stripMargin,

    // q226: list_reduce refold — state rides a 2-element BIGINT list
    // [l, b] prepended to the series (elements lifted to [y, 0] so the
    // accumulator and element types match); `//` and `div` both truncate
    // toward zero, so each step's integer rounding replays exactly.
    "q226_holt_forecast" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |ser AS (
        | SELECT event_type, count(*) AS n_obs,
        |  list(cents ORDER BY day) AS ys
        | FROM daily GROUP BY 1),
        |st AS (
        | SELECT event_type, n_obs, list_reduce(
        |  list_prepend([ys[1], CAST(0 AS BIGINT)],
        |    list_transform(ys[2:], y -> [y, CAST(0 AS BIGINT)])),
        |  (acc, e) -> [
        |    (2*e[1] + 8*(acc[1] + acc[2])) // 10,
        |    (3*(((2*e[1] + 8*(acc[1] + acc[2])) // 10) - acc[1])
        |      + 7*acc[2]) // 10]) AS s
        | FROM ser)
        |SELECT event_type, n_obs, s[1] AS level, s[2] AS trend,
        | s[1] + s[2] AS forecast_next, s[1] + 7*s[2] AS forecast_h
        |FROM st""".stripMargin,

    "q229_holt_winters" -> q229OracleSql,

    // q230: pair slopes as exact rationals; the double sort is an exact
    // total order at these magnitudes (see Trend.theilSen), ties by
    // (num, den), lower median at rank (p+1)//2.
    "q230_theil_sen" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT a.event_type,
        |  b.cents - a.cents AS num, b.day - a.day AS den
        | FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (
        | SELECT event_type, num, den,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n_pairs
        | FROM p)
        |SELECT event_type, n_pairs, num AS med_num, den AS med_den,
        | num * 1000000 // den AS slope_e6
        |FROM r WHERE rn = (n_pairs + 1) // 2""".stripMargin,

    // q231: same window/phase arithmetic; note pmod ≡ DuckDB % only
    // because day indices are non-negative.
    "q231_decompose" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |tr AS (
        | SELECT event_type, day, cents,
        |  sum(cents) OVER w AS wsum, count(*) OVER w AS wcnt
        | FROM daily
        | WINDOW w AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        | SELECT event_type, day, cents, wsum // 7 AS trend, day % 7 AS phase,
        |  cents - wsum // 7 AS detr
        | FROM tr WHERE wcnt = 7),
        |se AS (
        | SELECT event_type, phase,
        |  CAST(sum(detr) AS BIGINT) // count(*) AS s_raw
        | FROM t2 GROUP BY 1, 2),
        |ad AS (
        | SELECT event_type, CAST(sum(s_raw) AS BIGINT) // 7 AS adj
        | FROM se GROUP BY 1),
        |st AS (
        | SELECT se.event_type, phase, s_raw - adj AS seasonal
        | FROM se JOIN ad ON se.event_type = ad.event_type)
        |SELECT t2.event_type, day AS t, cents AS y,
        | CAST(trend AS BIGINT) AS trend, CAST(seasonal AS BIGINT) AS seasonal,
        | CAST(cents - trend - seasonal AS BIGINT) AS remainder
        |FROM t2 JOIN st ON t2.event_type = st.event_type
        |  AND t2.phase = st.phase""".stripMargin,

    // q232: day-scale interpolation — the ms scaling cancels exactly in
    // the truncating division ((a·k) div (b·k) = a div b), so the
    // day-grid replay matches the operator's ms arithmetic bit-for-bit.
    "q232_linear_fill" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |obs AS (SELECT * FROM daily WHERE day % 5 <> 2),
        |span AS (SELECT event_type, min(day) AS lo, max(day) AS hi
        | FROM obs GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS day
        | FROM span),
        |j AS (SELECT g.event_type, g.day, o.cents
        | FROM grid g LEFT JOIN obs o
        |  ON g.event_type = o.event_type AND g.day = o.day),
        |f AS (
        | SELECT event_type, day, cents,
        |  last_value(cents IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER wp AS pb,
        |  first_value(cents IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |    OVER wn AS nb
        | FROM j
        | WINDOW wp AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, day * 86400000 AS bucket_ms,
        | CASE WHEN cents IS NOT NULL THEN cents
        |  ELSE pv + (nv - pv) * (day - pb) // (nb - pb) END AS cents,
        | cents IS NOT NULL AS observed
        |FROM f""".stripMargin,

    // q233: the same minimax replay — interval means from prefix sums,
    // min over k ≥ i then max over j ≤ i, all in e6 integers.
    "q233_isotonic" ->
      """WITH b AS (
        | SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS s,
        |  count(*) AS c
        | FROM events GROUP BY 1),
        |cum AS (
        | SELECT bin, s, c, sum(s) OVER (ORDER BY bin) AS ps,
        |  sum(c) OVER (ORDER BY bin) AS pc FROM b),
        |iv AS (
        | SELECT l.bin AS j, h.bin AS k,
        |  (h.ps - (l.ps - l.s)) * 1000000 // (h.pc - (l.pc - l.c)) AS m
        | FROM cum l JOIN cum h ON l.bin <= h.bin),
        |mn AS (
        | SELECT p.bin AS i, iv.j, min(iv.m) AS mn
        | FROM b p JOIN iv ON iv.j <= p.bin AND p.bin <= iv.k
        | GROUP BY 1, 2),
        |ft AS (SELECT i, max(mn) AS fitted_e6 FROM mn GROUP BY 1)
        |SELECT 'all' AS grp, b.bin, b.s, b.c,
        | CAST(s * 1000000 // c AS BIGINT) AS rate_e6,
        | CAST(fitted_e6 AS BIGINT) AS fitted_e6
        |FROM b JOIN ft ON ft.i = b.bin""".stripMargin,

    // q248: same running-max + (dd DESC, day) witness windows.
    "q248_drawdown" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  sum(CAST(round(value*100) AS BIGINT)) AS cents
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, day, cents,
        |  max(cents) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS peak FROM d),
        |k AS (SELECT event_type, peak - cents AS dd, day, peak,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY peak - cents DESC, day) AS rk FROM r)
        |SELECT event_type, CAST(dd AS BIGINT) AS max_dd,
        |  CAST(day AS BIGINT) AS at_t, CAST(peak AS BIGINT) AS peak_at
        |FROM k WHERE rk = 1""".stripMargin,

    // q251: rank index, lag self-join, the same n²-scaled closed form
    // in HUGEINT.
    "q251_acf" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  sum(CAST(round(value*100) AS BIGINT)) AS y
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |ix AS (SELECT event_type, y,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
        | FROM d),
        |tot AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(y AS HUGEINT)) AS s,
        |  sum(CAST(y AS HUGEINT)*y) AS syy FROM ix GROUP BY 1),
        |p AS (SELECT a.event_type, b.t - a.t AS lag, count(*) AS cnt,
        |  sum(CAST(a.y AS HUGEINT)) AS h, sum(CAST(b.y AS HUGEINT)) AS tl,
        |  sum(CAST(a.y AS HUGEINT)*b.y) AS sab
        | FROM ix a JOIN ix b ON a.event_type = b.event_type
        |  AND b.t - a.t BETWEEN 1 AND 7
        | GROUP BY 1, 2)
        |SELECT p.event_type, CAST(lag AS BIGINT) AS lag,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n*n*sab - n*s*(h+tl) + cnt*s*s AS DECIMAL(38,0))
        |    AS VARCHAR) AS acf_num,
        |  CAST(CAST(n*(n*syy - s*s) AS DECIMAL(38,0)) AS VARCHAR) AS acf_den
        |FROM p JOIN tot ON p.event_type = tot.event_type""".stripMargin,

    // q254: the same five running sums over a ROWS 6 PRECEDING frame.
    "q254_rolling_ols" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  sum(CAST(round(value*100) AS BIGINT)) AS y
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, day,
        |  count(*) OVER w AS n,
        |  sum(CAST(day AS HUGEINT)) OVER w AS sx,
        |  sum(CAST(y AS HUGEINT)) OVER w AS sy,
        |  sum(CAST(day AS HUGEINT)*y) OVER w AS sxy,
        |  sum(CAST(day AS HUGEINT)*day) OVER w AS sxx
        | FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, CAST(day AS BIGINT) AS t, CAST(n AS BIGINT) AS n,
        |  CAST(CAST(n*sxy - sx*sy AS DECIMAL(38,0)) AS VARCHAR) AS slope_num,
        |  CAST(CAST(n*sxx - sx*sx AS DECIMAL(38,0)) AS VARCHAR) AS slope_den
        |FROM r""".stripMargin,

    "q283_lttb" -> q283OracleSql,

    // q289: identical trailing-window sums in HUGEINT, identical
    // rational prediction and e6 truncation.
    "q289_forecast_backtest" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS x,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |wn AS (SELECT event_type, x, y,
        |  count(*) OVER w AS n,
        |  CAST(sum(x) OVER w AS HUGEINT) AS sx,
        |  CAST(sum(y) OVER w AS HUGEINT) AS sy,
        |  sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
        |  sum(CAST(x AS HUGEINT) * y) OVER w AS sxy
        | FROM d WINDOW w AS (PARTITION BY event_type ORDER BY x
        |   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT event_type, x, y, sx, sy,
        |  7 * sxy - sx * sy AS sn, 7 * sxx - sx * sx AS sd
        | FROM wn WHERE n = 7),
        |e2 AS (SELECT event_type,
        |  CAST(abs(CAST(y AS HUGEINT) * (7 * sd)
        |      - (sy * sd + sn * (7 * x - sx))) * 1000000
        |    // (7 * sd) AS BIGINT) AS abs_err_e6
        | FROM f)
        |SELECT event_type, count(*) AS n_eval,
        |  CAST(sum(CAST(abs_err_e6 AS HUGEINT)) // count(*) AS BIGINT)
        |    AS mae_e6
        |FROM e2 GROUP BY 1""".stripMargin,

    // q299: pairwise sign sums + tie census, significance decided by the
    // same sqrt-free cross-multiplication.
    "q299_mann_kendall" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (SELECT a.event_type, CAST(sum(
        |   CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |   AS BIGINT) AS s_stat
        | FROM d a JOIN d b
        |  ON a.event_type = b.event_type AND a.day < b.day GROUP BY 1),
        |tc AS (SELECT event_type, x, CAST(count(*) AS BIGINT) AS tt
        | FROM d GROUP BY 1, 2),
        |v AS (SELECT event_type, CAST(sum(tt) AS BIGINT) AS n,
        |  CAST(sum(tt*(tt-1)*(2*tt+5)) AS BIGINT) AS tie18
        | FROM tc GROUP BY 1)
        |SELECT p.event_type, v.n, p.s_stat,
        |  CAST(v.n*(v.n-1)*(2*v.n+5) - v.tie18 AS BIGINT) AS var18,
        |  CASE WHEN p.s_stat <> 0 AND
        |    CAST(abs(p.s_stat)-1 AS HUGEINT)*(abs(p.s_stat)-1)
        |      * 18 * 1000000000000 >
        |    CAST(1959964 AS HUGEINT) * 1959964
        |      * (v.n*(v.n-1)*(2*v.n+5) - v.tie18)
        |   THEN CASE WHEN p.s_stat > 0 THEN 'increasing'
        |     ELSE 'decreasing' END ELSE 'none' END AS trend
        |FROM p JOIN v USING (event_type)""".stripMargin,

    // q380: shifted-copy equi join per lag, exact Pearson pieces, the
    // two-root corrected-isqrt correlation.
    "q380_lead_lag" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |x AS (SELECT day AS o, cents AS xa FROM d
        | WHERE event_type = 'view'),
        |y0 AS (SELECT day, cents AS yb FROM d
        | WHERE event_type = 'purchase'),
        |y AS (SELECT day - lag AS o, lag, yb FROM y0,
        | (SELECT unnest(generate_series(0, 7)) AS lag) ll),
        |st AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(xa AS HUGEINT)) AS sx, sum(CAST(yb AS HUGEINT)) AS sy,
        |  sum(CAST(xa AS HUGEINT) * xa) AS sxx,
        |  sum(CAST(yb AS HUGEINT) * yb) AS syy,
        |  sum(CAST(xa AS HUGEINT) * yb) AS sxy
        | FROM x JOIN y USING (o) GROUP BY 1),
        |q AS (SELECT CAST(lag AS BIGINT) AS lag, n,
        |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS dx,
        |  n * syy - sy * sy AS dy FROM st),
        |s0x AS (SELECT *,
        |  CAST(floor(sqrt(CAST(greatest(dx, 0) AS DOUBLE))) AS BIGINT)
        |    AS s0a,
        |  CAST(floor(sqrt(CAST(greatest(dy, 0) AS DOUBLE))) AS BIGINT)
        |    AS s0b FROM q),
        |rr AS (SELECT *,
        |  CASE WHEN CAST(s0a AS HUGEINT) * s0a > greatest(dx, 0)
        |    THEN s0a - 1
        |   WHEN (CAST(s0a AS HUGEINT) + 1) * (s0a + 1) <= greatest(dx, 0)
        |    THEN s0a + 1 ELSE s0a END AS rx,
        |  CASE WHEN CAST(s0b AS HUGEINT) * s0b > greatest(dy, 0)
        |    THEN s0b - 1
        |   WHEN (CAST(s0b AS HUGEINT) + 1) * (s0b + 1) <= greatest(dy, 0)
        |    THEN s0b + 1 ELSE s0b END AS ry FROM s0x)
        |SELECT lag, n, CAST(CAST(num AS DECIMAL(38,0)) AS VARCHAR) AS num,
        | CAST(CAST(dx AS DECIMAL(38,0)) AS VARCHAR) AS dx,
        | CAST(CAST(dy AS DECIMAL(38,0)) AS VARCHAR) AS dy,
        | CASE WHEN dx <= 0 OR dy <= 0 THEN NULL
        |  ELSE CAST(num * 1000000 // (CAST(rx AS HUGEINT) * ry)
        |   AS BIGINT) END AS xcorr_e6
        |FROM rr""".stripMargin,

    // q400: the q231 decomposition CTEs on the lineitem series, then
    // the cleared-variance strength ratios with greatest-0 clamps.
    "q400_seasonal_strength" ->
      """WITH daily AS (SELECT l_returnflag,
        |  epoch_ms(l_shipdate) // 86400000 AS day,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) AS cents
        | FROM lineitem GROUP BY 1, 2),
        |tr AS (SELECT l_returnflag, day, cents,
        |  sum(cents) OVER w AS wsum, count(*) OVER w AS wcnt
        | FROM daily WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (SELECT l_returnflag, day, cents, wsum // 7 AS trend,
        |  day % 7 AS phase, cents - wsum // 7 AS detr
        | FROM tr WHERE wcnt = 7),
        |se AS (SELECT l_returnflag, phase,
        |  CAST(sum(detr) AS BIGINT) // count(*) AS s_raw
        | FROM t2 GROUP BY 1, 2),
        |ad AS (SELECT l_returnflag, CAST(sum(s_raw) AS BIGINT) // 7
        |  AS adj FROM se GROUP BY 1),
        |st AS (SELECT se.l_returnflag, phase, s_raw - adj AS seasonal
        | FROM se JOIN ad ON se.l_returnflag = ad.l_returnflag),
        |dc AS (SELECT t2.l_returnflag,
        |  cents - trend - seasonal AS r,
        |  cents - seasonal AS u,
        |  cents - trend AS s
        | FROM t2 JOIN st ON t2.l_returnflag = st.l_returnflag
        |  AND t2.phase = st.phase),
        |ag AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(r) AS BIGINT) AS sr, sum(CAST(r AS HUGEINT) * r)
        |   AS qr,
        |  CAST(sum(u) AS BIGINT) AS su, sum(CAST(u AS HUGEINT) * u)
        |   AS qu,
        |  CAST(sum(s) AS BIGINT) AS ss, sum(CAST(s AS HUGEINT) * s)
        |   AS qs
        | FROM dc GROUP BY 1),
        |vv AS (SELECT l_returnflag, n,
        |  n * qr - CAST(sr AS HUGEINT) * sr AS vr,
        |  n * qu - CAST(su AS HUGEINT) * su AS vu,
        |  n * qs - CAST(ss AS HUGEINT) * ss AS vs
        | FROM ag)
        |SELECT l_returnflag, n,
        | CASE WHEN vu > 0 THEN greatest(CAST(0 AS BIGINT),
        |  CAST(1000000 - vr * 1000000 // vu AS BIGINT))
        | END AS trend_strength_e6,
        | CASE WHEN vs > 0 THEN greatest(CAST(0 AS BIGINT),
        |  CAST(1000000 - vr * 1000000 // vs AS BIGINT))
        | END AS seasonal_strength_e6
        |FROM vv""".stripMargin,

    // q422: per-group cleared moments, pinned-ln e3 points, exact
    // integer OLS slope.
    "q422_taylors_law" ->
      """WITH g AS (SELECT l_partkey AS g, CAST(count(*) AS BIGINT)
        |  AS n,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s,
        |  sum(CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT)
        |   * CAST(round(l_quantity) AS BIGINT)) AS q
        | FROM lineitem GROUP BY 1),
        |m AS (SELECT g, n,
        |  CAST(CAST(s AS HUGEINT) * 1000 // n AS BIGINT) AS m_e3,
        |  CAST((n * q - CAST(s AS HUGEINT) * s) * 1000000
        |   // (CAST(n AS HUGEINT) * n) AS BIGINT) AS v_e6 FROM g),
        |pts AS (SELECT
        |  CAST(round(ln(CAST(m_e3 AS DOUBLE)) * 1000.0) AS BIGINT)
        |   AS lx,
        |  CAST(round(ln(CAST(v_e6 AS DOUBLE)) * 1000.0) AS BIGINT)
        |   AS ly
        | FROM m WHERE n > 1 AND v_e6 > 0 AND m_e3 > 0),
        |dr AS (SELECT CAST(coalesce(sum(CASE WHEN n <= 1 OR v_e6 <= 0
        |  OR m_e3 <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped
        | FROM m),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(lx) AS BIGINT) AS sx,
        |  CAST(sum(ly) AS BIGINT) AS sy,
        |  sum(CAST(lx AS HUGEINT) * ly) AS sxy,
        |  sum(CAST(lx AS HUGEINT) * lx) AS sxx FROM pts)
        |SELECT n_groups, n_dropped,
        | CAST(CAST(n_groups * sxy - CAST(sx AS HUGEINT) * sy
        |  AS DECIMAL(38,0)) AS VARCHAR) AS slope_num,
        | CAST(CAST(n_groups * sxx - CAST(sx AS HUGEINT) * sx
        |  AS DECIMAL(38,0)) AS VARCHAR) AS slope_den,
        | CASE WHEN n_groups * sxx - CAST(sx AS HUGEINT) * sx > 0 THEN
        |  CAST((n_groups * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
        |   // (n_groups * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT)
        | END AS taylor_b_e6
        |FROM ag, dr""".stripMargin,

    // q423: rn-indexed census, per-(w, block) cleared cumulative
    // deviations, corrected-isqrt sd, |windows|-point integer OLS.
    "q423_hurst" ->
      """WITH daily AS (SELECT epoch_ms(l_shipdate) // 86400000 AS o,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) AS x
        | FROM lineitem GROUP BY 1),
        |rn AS (SELECT o, x, CAST(row_number() OVER (ORDER BY o)
        |  AS BIGINT) AS rn FROM daily),
        |tg AS (SELECT rn.*, ws.w FROM rn,
        | (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS w) ws),
        |bl AS (SELECT *, (rn - 1) // w AS blk,
        |  rn - ((rn - 1) // w) * w AS kin FROM tg),
        |st AS (SELECT w, blk, kin, x,
        |  count(*) OVER pb AS nb, sum(x) OVER pb AS sb,
        |  sum(x) OVER (PARTITION BY w, blk ORDER BY rn
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM bl WINDOW pb AS (PARTITION BY w, blk)),
        |fl AS (SELECT * FROM st WHERE nb = w),
        |dv AS (SELECT w, blk, x, sb, w * cum - kin * sb AS c FROM fl),
        |bk AS (SELECT w, blk, max(c) - min(c) AS rcl, max(sb) AS sb,
        |  sum(CAST(x AS HUGEINT) * x) AS qb FROM dv GROUP BY 1, 2),
        |v0 AS (SELECT w, blk, rcl,
        |  w * qb - CAST(sb AS HUGEINT) * sb AS v FROM bk),
        |s0 AS (SELECT *, CAST(floor(sqrt(CAST(v AS DOUBLE)))
        |  AS BIGINT) AS sq0 FROM v0),
        |s1 AS (SELECT w, blk, rcl,
        |  CASE WHEN CAST(sq0 AS HUGEINT) * sq0 > v THEN sq0 - 1
        |   WHEN (CAST(sq0 AS HUGEINT) + 1) * (sq0 + 1) <= v
        |    THEN sq0 + 1 ELSE sq0 END AS sd FROM s0),
        |rs AS (SELECT w, blk, CAST(CAST(rcl AS HUGEINT) * 1000000
        |  // sd AS BIGINT) AS rs FROM s1 WHERE sd > 0),
        |pw AS (SELECT w, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(sum(rs) // count(*) AS BIGINT) AS mean_rs_e6
        | FROM rs GROUP BY 1),
        |pts AS (SELECT
        |  CAST(round(ln(CAST(w AS DOUBLE)) * 1000.0) AS BIGINT) AS lx,
        |  CAST(round(ln(CAST(mean_rs_e6 AS DOUBLE)) * 1000.0)
        |   AS BIGINT) AS ly FROM pw),
        |ols AS (SELECT CAST(count(*) AS BIGINT) AS np,
        |  CAST(sum(lx) AS BIGINT) AS sx,
        |  CAST(sum(ly) AS BIGINT) AS sy,
        |  CAST(sum(lx * ly) AS BIGINT) AS sxy,
        |  CAST(sum(lx * lx) AS BIGINT) AS sxx FROM pts),
        |hh AS (SELECT CASE WHEN np * sxx - sx * sx > 0 THEN
        |  CAST(CAST(np * sxy - sx * sy AS HUGEINT) * 1000000
        |   // (np * sxx - sx * sx) AS BIGINT) END AS hurst_e6
        | FROM ols)
        |SELECT pw.w, pw.n_blocks, pw.mean_rs_e6, hh.hurst_e6
        |FROM pw, hh""".stripMargin,

    // q451: exact HUGEINT OLS moments, the identical pinned residual
    // chain rounded to e3 per point, integer DW ratio.
    "q451_durbin_watson" ->
      """WITH d AS (SELECT
        |  epoch_ms(CAST(l_shipdate AS TIMESTAMP)) // 86400000 AS x0,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) AS y
        | FROM lineitem GROUP BY 1),
        |mn AS (SELECT min(x0) AS m FROM d),
        |b AS (SELECT x0 - m AS x, y FROM d, mn),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy FROM b),
        |e AS (SELECT b.x, CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
        |  ELSE CAST(round((CAST(y AS DOUBLE)
        |   - (CAST(sy AS DOUBLE)
        |      - (CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
        |   - (CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE))
        |     * CAST(x AS DOUBLE)) * 1000.0) AS BIGINT) END AS e3
        | FROM b, s),
        |l AS (SELECT e3, lag(e3) OVER (ORDER BY x) AS lagE FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        | CASE WHEN COALESCE(sum(CAST(e3 AS HUGEINT) * e3), 0) > 0
        |  THEN CAST(sum(CASE WHEN lagE IS NULL THEN CAST(0 AS HUGEINT)
        |    ELSE CAST(e3 - lagE AS HUGEINT) * (e3 - lagE) END)
        |   * 1000000
        |   // sum(CAST(e3 AS HUGEINT) * e3) AS BIGINT) END AS dw_e6
        |FROM l""".stripMargin,

    // q395: banded census self-join; all quotients truncate toward
    // zero (HUGEINT // ≡ the operator's tz() DECIMAL division).
    "q395_newey_west" ->
      """WITH daily AS (SELECT epoch_ms(l_shipdate) // 86400000 AS o,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |   AS BIGINT) AS v
        | FROM lineitem GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS s FROM daily),
        |stm AS (SELECT n,
        |  CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT) AS m_e6
        | FROM st),
        |dev AS (SELECT o, n, CAST(v AS HUGEINT) * 1000000 - m_e6 AS d
        | FROM daily CROSS JOIN stm),
        |pr AS (SELECT y.o - x.o AS lag, x.n, x.d * y.d AS p
        | FROM dev x JOIN dev y ON y.o - x.o BETWEEN 0 AND 5),
        |ag AS (SELECT lag, max(n) AS n, sum(p) AS gnum
        | FROM pr GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        | CAST(CAST(gnum // n AS DECIMAL(38,0)) AS VARCHAR)
        |  AS gamma_e12,
        | CAST((6 - lag) * 1000000 // 6 AS BIGINT) AS bartlett_w_e6,
        | CAST(CAST(CASE WHEN lag = 0 THEN gnum // n
        |  ELSE (2 * (6 - lag) * gnum) // (6 * CAST(n AS HUGEINT)) END
        |  AS DECIMAL(38,0)) AS VARCHAR) AS term_e12
        |FROM ag""".stripMargin,

    // q330: window construction + the O(w²) self-join replayed verbatim.
    "q330_matrix_profile" ->
      """WITH d AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS pos,
        |  n AS v0,
        |  lead(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS v1,
        |  lead(n, 2) OVER (PARTITION BY event_type ORDER BY day) AS v2,
        |  lead(n, 3) OVER (PARTITION BY event_type ORDER BY day) AS v3
        | FROM d),
        |ww AS (SELECT * FROM w WHERE v3 IS NOT NULL),
        |p AS (SELECT a.event_type, a.pos AS i, b.pos AS j,
        |  (a.v0-b.v0)*(a.v0-b.v0) + (a.v1-b.v1)*(a.v1-b.v1)
        |   + (a.v2-b.v2)*(a.v2-b.v2) + (a.v3-b.v3)*(a.v3-b.v3) AS d2
        | FROM ww a JOIN ww b
        |   ON a.event_type = b.event_type AND abs(a.pos - b.pos) >= 4),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type, i
        |  ORDER BY d2, j) AS rn FROM p)
        |SELECT event_type, i, j AS nn_j, CAST(d2 AS BIGINT) AS nn_d2
        |FROM r WHERE rn = 1""".stripMargin,

    // q305: the same window composition; argmax totalized by a rank.
    "q305_page_hinkley" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS x
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, day, x,
        |  row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |  sum(x) OVER (PARTITION BY event_type ORDER BY day) AS cumx,
        |  sum(x) OVER (PARTITION BY event_type) AS tot,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM daily),
        |d AS (SELECT *, x*1000000 - (cumx*1000000 // i) AS dev FROM w),
        |u AS (SELECT *, sum(dev) OVER (PARTITION BY event_type
        |  ORDER BY day) AS uu FROM d),
        |p AS (SELECT *, uu - min(uu) OVER (PARTITION BY event_type
        |  ORDER BY day) AS ph FROM u),
        |a AS (SELECT *, ph > 2*(tot*1000000 // n) AS alarm FROM p),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY ph DESC, day) AS rk FROM a)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
        | CAST(max(CASE WHEN rk = 1 THEN ph END) AS BIGINT) AS ph_max_e6,
        | CAST(max(CASE WHEN rk = 1 THEN day END) AS BIGINT)
        |   AS ph_argmax_day,
        | CAST(min(CASE WHEN alarm THEN day END) AS BIGINT)
        |   AS first_alarm_day,
        | CAST(sum(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_alarms
        |FROM r GROUP BY 1""".stripMargin,

    // q303: list_reduce refold with [z, p, lastday] state — both
    // engines' integer division truncates identically on the
    // non-negative series.
    "q303_croston" ->
      """WITH daily AS (
        | SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(count(*) AS BIGINT) AS q
        | FROM events WHERE user_id % 17 = 3 GROUP BY 1, 2),
        |ser AS (
        | SELECT event_type, CAST(count(*) AS BIGINT) AS n_demands,
        |  list([day, q] ORDER BY day) AS dq
        | FROM daily GROUP BY 1),
        |st AS (
        | SELECT event_type, n_demands, list_reduce(
        |  list_prepend([dq[1][2], CAST(1 AS BIGINT), dq[1][1]],
        |    list_transform(dq[2:], e -> [e[2], CAST(0 AS BIGINT), e[1]])),
        |  (acc, e) -> [
        |    (2*e[1] + 8*acc[1]) // 10,
        |    (2*(e[3] - acc[3]) + 8*acc[2]) // 10,
        |    e[3]]) AS s
        | FROM ser)
        |SELECT event_type, n_demands, s[1] AS size_level,
        |  s[2] AS interval_level,
        |  s[1] * 1000000 // greatest(s[2], 1) AS rate_e6
        |FROM st""".stripMargin,
  )
}
