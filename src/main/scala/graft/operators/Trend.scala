package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Per-group linear trend (ordinary least squares on one regressor) via
  * integer sufficient statistics — the monitoring question "is this
  * metric drifting up or down, and how fast" answered exactly: the OLS
  * slope is the ratio
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * and both numerator and denominator are BIGINT-exact when x and y are
  * integers, so emitting the ratio UNREDUCED hash-gates across engines
  * (the q140 AUC discipline). The intercept shares the same denominator:
  * intercept = (Σy·Σx² − Σx·Σxy) / den.
  *
  * Shape: one map-side-combinable aggregation per group — five sums, no
  * window, no sort, no second pass. At 100 TB this is a single shuffle
  * keyed by the group with partial aggregation upstream; x should be a
  * SMALL integer index (day number, not epoch millis) so n·Σx² stays in
  * 64 bits — callers own that scaling, the operator checks it loudly. */
object Trend {

  /** Sufficient-statistics OLS per group. Output: group cols + (n,
    * sum_x, sum_y, slope_num, slope_den, intercept_num) — slope =
    * slope_num/slope_den, intercept = intercept_num/slope_den;
    * slope_den = 0 marks a degenerate group (all x equal). */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: Column,
      yCol: Column, maxAbsX: Long = 1000000L): DataFrame = {
    val guarded = df.withColumn("__x",
        when(abs(xCol.cast("long")) <= maxAbsX, xCol.cast("long"))
          .otherwise(raise_error(concat(lit(s"Trend x exceeds $maxAbsX: "),
            xCol.cast("string")))))
      .withColumn("__y", yCol.cast("long"))
    guarded
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__y")).as("sum_xy"),
        sum(col("__x") * col("__x")).as("sum_xx"))
      .withColumn("slope_num", expr("n * sum_xy - sum_x * sum_y"))
      .withColumn("slope_den", expr("n * sum_xx - sum_x * sum_x"))
      .withColumn("intercept_num", expr("sum_y * sum_xx - sum_x * sum_xy"))
      .drop("sum_xy", "sum_xx")
  }

  /** SAX symbolization (Lin, Keogh, Lonardi & Chiu 2003, "A symbolic
    * representation of time series" — public result): each key's ordered
    * value sequence is PAA-compressed into `segments` equal-count
    * segments, each segment's mean is binned against fixed breakpoints,
    * and the per-segment symbols concatenate into one word per key — the
    * alphabet-string form motif/anomaly miners index instead of raw
    * series.
    *
    * Exactness discipline: segment assignment is pure integer
    * ((rn−1)·segments div n), and the mean-vs-breakpoint comparisons are
    * CROSS-MULTIPLIED — sum < b·n_seg instead of sum/n_seg < b — so no
    * division ever happens and the word is bit-reproducible. Breakpoints
    * are integer (cents-scale) plan literals shared with the oracle.
    *
    * Scale shape: one rank window + one (key, segment) aggregation + one
    * per-key ordered reassembly of ≤ `segments` rows — all partitioned by
    * the key, one shuffle of (key, value) pairs. Output:
    * (keys..., n, sax_word). */
  def saxWords(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
      valueCol: Column, segments: Int, breakpoints: Seq[Long],
      alphabet: String = "abcdefghijklmnopqrstuvwxyz"): DataFrame = {
    require(segments >= 1 && breakpoints.nonEmpty)
    require(breakpoints.size < alphabet.length,
      "alphabet too small for breakpoint count")
    require(breakpoints == breakpoints.sorted, "breakpoints must ascend")
    require(orderCols.nonEmpty, "need a (total) segment order")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val seg = df
      .withColumn("__v", valueCol.cast("long"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(keys.map(col): _*)))
      .withColumn("__seg", expr(s"(__rn - 1) * $segments div __n"))
      .groupBy((keys :+ "__seg").map(col): _*)
      .agg(sum(col("__v")).as("s"), count(lit(1)).as("m"))
    // cross-multiplied binning: symbol index = #breakpoints below mean
    val sym = breakpoints.zipWithIndex.foldLeft(lit(alphabet.substring(0, 1))) {
      case (acc, (b, i)) =>
        when(col("s") >= lit(b) * col("m"),
          lit(alphabet.substring(i + 1, i + 2))).otherwise(acc)
    }
    seg.withColumn("__sym", sym)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("m")).as("n"),
        array_join(transform(
          sort_array(collect_list(struct(col("__seg"), col("__sym")))),
          e => e.getField("__sym")), "").as("sax_word"))
  }

  /** Holt double-exponential smoothing (Holt 1957 / Winters 1960, the
    * no-seasonality form) — level + trend forecasting for "where is this
    * metric heading", one step beyond [[groupedOls]]' global line: the
    * smoothing adapts to recent shifts instead of fitting all history
    * equally.
    *
    *   l_i = α·y_i + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1},   l_1 = y_1, b_1 = 0
    *
    * Exactness discipline: α and β are integer ratios (alphaNum/den,
    * betaNum/den) and every step rounds by truncating `div` BEFORE
    * feeding the next step — the recursion is pure BIGINT, so the final
    * (level, trend, forecast) hash-gates across engines (Spark `div` and
    * DuckDB `//` both truncate toward zero, negatives included).
    *
    * Scale shape: one groupBy collects each key's day series and folds it
    * in its executor via `aggregate` — the same per-key-series-fits
    * contract as ewmaResiduals/SAX; keys fan out across the cluster, and
    * the fold itself is codegen'd array arithmetic, no UDF. */
  def holtLinear(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column, alphaNum: Int, betaNum: Int, den: Int,
      horizon: Int = 7): DataFrame = {
    require(den > 0 && alphaNum > 0 && alphaNum <= den &&
      betaNum >= 0 && betaNum <= den && horizon >= 1)
    val base = df.select(keyCols.map(col) ++ Seq(
      orderCol.cast("long").as("__o"), valueCol.cast("long").as("__y")): _*)
    val series = base.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__o"), col("__y"))))
        .as("arr"), count(lit(1)).as("n_obs"))
      .withColumn("ys", expr("transform(arr, e -> e.__y)"))
    val (a, b, d) = (alphaNum, betaNum, den)
    val lNew = s"(($a * y + ${d - a} * (acc.l + acc.b)) div $d)"
    val fold =
      s"""aggregate(slice(ys, 2, size(ys) - 1),
         |  named_struct('l', element_at(ys, 1), 'b', CAST(0 AS BIGINT)),
         |  (acc, y) -> named_struct(
         |    'l', $lNew,
         |    'b', (($b * ($lNew - acc.l) + ${d - b} * acc.b) div $d)))"""
        .stripMargin
    series.withColumn("st", expr(fold))
      .select(keyCols.map(col) ++ Seq(col("n_obs"),
        col("st.l").as("level"), col("st.b").as("trend")): _*)
      .withColumn("forecast_next", expr("level + trend"))
      .withColumn("forecast_h", expr(s"level + ${horizon}L * trend"))
  }

  /** Croston's method (Croston 1972, "Forecasting and stock control for
    * intermittent demands") — THE forecaster for series that are mostly
    * zeros (spare parts, rare-event revenue, long-tail SKUs), where SES
    * on the raw series chases zeros and Holt extrapolates noise. Two
    * coupled SES recursions run over DEMAND OCCURRENCES only:
    *
    *   size:     z_i = α·q_i + (1−α)·z_{i−1}
    *   interval: p_i = α·I_i + (1−α)·p_{i−1},  I_i = gap since last demand
    *
    * with the per-period demand rate forecast ẑ/p̂. Initialization is
    * pinned (z₁ = first demand, p₁ = 1, fold from the second
    * occurrence) so the whole recursion is deterministic. Same
    * exactness discipline as [[holtLinear]]: integer-ratio α, each step
    * truncates to BIGINT before the next, rate emitted e6-truncated
    * alongside the exact (level, interval) pair.
    *
    * Scale shape: identical to holtLinear — occurrences are ALREADY the
    * sparse series (zero periods never materialize, which is the whole
    * point at 100 TB: a 99%-zero daily grid never exists), one groupBy
    * collects each key's occurrence list, the fold is codegen'd array
    * arithmetic in the executor. */
  def croston(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column, alphaNum: Int, den: Int): DataFrame = {
    require(den > 0 && alphaNum > 0 && alphaNum <= den)
    val base = df.select(keyCols.map(col) ++ Seq(
      orderCol.cast("long").as("__o"), valueCol.cast("long").as("__y")): _*)
      .where(col("__y").isNotNull && col("__y") =!= 0L)
    val series = base.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__o"), col("__y"))))
        .as("arr"), count(lit(1)).as("n_demands"))
    val (a, d) = (alphaNum, den)
    val fold =
      s"""aggregate(slice(arr, 2, size(arr) - 1),
         |  named_struct('z', element_at(arr, 1).__y, 'p', 1L,
         |    'd', element_at(arr, 1).__o),
         |  (acc, e) -> named_struct(
         |    'z', (($a * e.__y + ${d - a} * acc.z) div $d),
         |    'p', (($a * (e.__o - acc.d) + ${d - a} * acc.p) div $d),
         |    'd', e.__o))""".stripMargin
    series.withColumn("st", expr(fold))
      .select(keyCols.map(col) ++ Seq(col("n_demands"),
        col("st.z").as("size_level"), col("st.p").as("interval_level")): _*)
      .withColumn("rate_e6",
        expr("size_level * 1000000L div greatest(interval_level, 1L)"))
  }

  /** Holt–Winters additive triple smoothing (Winters 1960) — level +
    * trend + a length-m seasonal cycle, the full classical forecaster
    * for metrics with weekly shape:
    *
    *   l_i = α·(y_i − s_{i−m}) + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
    *   s_i = γ·(y_i − l_i) + (1−γ)·s_{i−m}
    *
    * Classical init on the first full cycle: l_m = mean(y_1..y_m)
    * (truncating), b_m = 0, s_j = y_j − l_m; the recursion folds the
    * remaining observations with the seasonal array as a rotating queue
    * inside the accumulator struct. Same exactness discipline as
    * [[holtLinear]]: integer-ratio coefficients, truncating `div` per
    * step, the whole state BIGINT — hash-exact cross-engine.
    *
    * Output per key: n_obs, level, trend, s_next (the seasonal index the
    * next step will consume) and forecast_next = level + trend + s_next.
    * Keys with fewer than m observations emit NULL smoothing fields
    * (no cycle to initialize from). */
  def holtWinters(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column, m: Int, alphaNum: Int, betaNum: Int,
      gammaNum: Int, den: Int): DataFrame = {
    require(m >= 2 && den > 0 &&
      Seq(alphaNum, betaNum, gammaNum).forall(n => n >= 0 && n <= den) &&
      alphaNum > 0)
    val base = df.select(keyCols.map(col) ++ Seq(
      orderCol.cast("long").as("__o"), valueCol.cast("long").as("__y")): _*)
    val series = base.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__o"), col("__y"))))
        .as("arr"), count(lit(1)).as("n_obs"))
      .withColumn("ys", expr("transform(arr, e -> e.__y)"))
      .withColumn("l0", expr(
        s"aggregate(slice(ys, 1, $m), CAST(0 AS BIGINT), (a, y) -> a + y) div $m"))
    val (a, b, g, d) = (alphaNum, betaNum, gammaNum, den)
    // the new level, inlined at each use (no let-binding in SQL lambdas)
    val L = s"(($a * (y - element_at(acc.s, 1)) + ${d - a} * (acc.l + acc.b)) div $d)"
    val fold =
      s"""aggregate(slice(ys, ${m + 1}, size(ys) - $m),
         |  named_struct('l', l0, 'b', CAST(0 AS BIGINT),
         |    's', transform(slice(ys, 1, $m), y -> y - l0)),
         |  (acc, y) -> named_struct(
         |    'l', $L,
         |    'b', (($b * ($L - acc.l) + ${d - b} * acc.b) div $d),
         |    's', concat(slice(acc.s, 2, ${m - 1}),
         |      array(($g * (y - $L) + ${d - g} * element_at(acc.s, 1)) div $d))))"""
        .stripMargin
    series
      .withColumn("st", when(size(col("ys")) >= m, expr(fold)))
      .select(keyCols.map(col) ++ Seq(col("n_obs"),
        col("st.l").as("level"), col("st.b").as("trend"),
        expr("element_at(st.s, 1)").as("s_next")): _*)
      .withColumn("forecast_next", expr("level + trend + s_next"))
  }

  /** Theil–Sen robust slope (Theil 1950, Sen 1968): the median of all
    * pairwise slopes (y_j−y_i)/(x_j−x_i) over x_i < x_j — a 29%-breakdown
    * trend estimate that one spiked day cannot drag, the robust sibling
    * of [[groupedOls]].
    *
    * Exactness: slopes are exact rationals (num, den with den > 0). They
    * sort by their DOUBLE ratio, which is an EXACT total order whenever
    * |num| · maxDen < 2^52 (distinct rationals with den ≤ maxDen differ
    * by ≥ 1/maxDen², far above the ulp at these magnitudes) — x must be a
    * small index (day number), the same caller contract as groupedOls'
    * maxAbsX guard, enforced loudly here too. Ties order by (num, den)
    * so the LOWER median picked at rank ⌈p/2⌉ is engine-independent (no
    * fraction averaging). Output keeps the median as (num, den) plus the
    * truncated micro-slope.
    *
    * Scale shape: the pair explosion is per-key quadratic — the
    * per-key-series-fits contract (daily/hourly series, not raw events);
    * the self-join is a single hash exchange on the key and the ranked
    * window rides the same partitioning. */
  def theilSen(df: DataFrame, keyCols: Seq[String], xCol: Column,
      yCol: Column, maxAbsX: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = df.select(keyCols.map(col) ++ Seq(
      when(abs(xCol.cast("long")) <= maxAbsX, xCol.cast("long"))
        .otherwise(raise_error(concat(lit(s"theilSen x exceeds $maxAbsX: "),
          xCol.cast("string")))).as("__x"),
      yCol.cast("long").as("__y")): _*)
    val a = guarded.toDF(keyCols ++ Seq("__x", "__y"): _*).as("a")
    val b = guarded.toDF(keyCols.map(_ + "__b") ++ Seq("__xb", "__yb"): _*)
      .as("b")
    val joinCond = keyCols.map(k => col(k) === col(k + "__b"))
      .reduce(_ && _) && col("__x") < col("__xb")
    val pairs = a.join(b, joinCond)
      .select(keyCols.map(col) ++ Seq(
        (col("__yb") - col("__y")).as("num"),
        (col("__xb") - col("__x")).as("den")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col("num").cast("double") / col("den")).asc,
        col("num").asc, col("den").asc)
    val cw = Window.partitionBy(keyCols.map(col): _*)
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(cw))
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(keyCols.map(col) ++ Seq(col("n_pairs"),
        col("num").as("med_num"), col("den").as("med_den"),
        expr("num * 1000000 div den").as("slope_e6")): _*)
  }

  /** Classical additive decomposition (the moving-average method,
    * Macaulay 1931 / the "decompose" of every stats package): split a
    * periodic series into trend + seasonal + remainder —
    *
    *   trend_t    = centered length-m moving average (m odd here; rows
    *                without a full window are dropped, the classical
    *                edge behavior)
    *   seasonal_p = mean of (y − trend) over phase p = t mod m, centered
    *                so the m indices sum to ~0
    *   remainder  = y − trend − seasonal
    *
    * All means are truncating integer divisions, so the decomposition is
    * BIGINT-exact and hash-gateable; exact additivity y = T + S + R holds
    * by construction since R is defined as the difference.
    *
    * Scale shape: one window sort per key for the moving average, one
    * tiny (key × m phases) aggregate joined back broadcast — two
    * exchanges total, no collected series. `orderCol` must be a dense
    * integer index (day number) — phases are `orderCol mod m`. */
  def classicalDecompose(df: DataFrame, keyCols: Seq[String],
      orderCol: Column, valueCol: Column, m: Int): DataFrame = {
    require(m >= 2 && m % 2 == 1, "m must be odd (centered window)")
    import org.apache.spark.sql.expressions.Window
    val half = m / 2
    val base = df.select(keyCols.map(col) ++ Seq(
      orderCol.cast("long").as("t"), valueCol.cast("long").as("y")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("t"))
      .rowsBetween(-half, half)
    val withTrend = base
      .withColumn("__wsum", sum(col("y")).over(w))
      .withColumn("__wcnt", count(lit(1)).over(w))
      .where(col("__wcnt") === m) // full centered window only
      .withColumn("trend", expr(s"__wsum div $m"))
      .withColumn("phase", pmod(col("t"), lit(m.toLong)))
      .withColumn("detr", col("y") - col("trend"))
    val seasonal = withTrend
      .groupBy(keyCols.map(col) :+ col("phase"): _*)
      .agg(sum(col("detr")).as("__ssum"), count(lit(1)).as("__scnt"))
      .withColumn("s_raw", expr("__ssum div __scnt"))
    val adjust = seasonal.groupBy(keyCols.map(col): _*)
      .agg(sum(col("s_raw")).as("__asum"))
      .withColumn("__adj", expr(s"__asum div $m"))
      .select(keyCols.map(col) :+ col("__adj"): _*)
    val sTable = seasonal.join(broadcast(adjust), keyCols)
      .withColumn("seasonal", col("s_raw") - col("__adj"))
      .select(keyCols.map(col) ++ Seq(col("phase"), col("seasonal")): _*)
    withTrend.join(broadcast(sTable), keyCols :+ "phase")
      .withColumn("remainder", col("y") - col("trend") - col("seasonal"))
      .select(keyCols.map(col) ++ Seq(col("t"), col("y"), col("trend"),
        col("seasonal"), col("remainder")): _*)
  }

  /** Maximum drawdown of a per-group integer series — the largest
    * peak-to-trough decline max_t (max_{s≤t} y_s − y_t), the standard
    * "how badly did this metric collapse from its best" readout
    * (finance's risk measure, equally apt for daily revenue or QPS).
    * Witness rule: the earliest time achieving the max (dd DESC, t ASC),
    * with the running peak at that moment riding along — fully ordered,
    * hash-stable. `orderCol` must be unique per group (a day index).
    *
    * Shape: one running-max window + one pick window, BOTH partitioned
    * by the group keys — one exchange, the second pass is a re-sort of
    * already-co-located partitions. No self-join, no collect.
    * Output: keyCols + (max_dd, at_t, peak_at). */
  def maxDrawdown(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val wRun = Window.partitionBy(keys: _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPick = Window.partitionBy(keys: _*)
      .orderBy(col("__dd").desc, col("__t"))
    df.select(keys :+ orderCol.cast("long").as("__t") :+
        valueCol.cast("long").as("__y"): _*)
      .withColumn("__peak", max(col("__y")).over(wRun))
      .withColumn("__dd", col("__peak") - col("__y"))
      .withColumn("__rk", row_number().over(wPick))
      .where(col("__rk") === 1)
      .select(keys :+ col("__dd").as("max_dd") :+ col("__t").as("at_t") :+
        col("__peak").as("peak_at"): _*)
  }

  /** Sample autocorrelation function — exact sufficient statistics per
    * (group, lag): with t the per-group rank of `orderCol` (so gaps in
    * the raw axis never mis-pair) and ȳ the FULL-series mean,
    *   r_k = Σ_{t≤n−k}(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)²
    * is the exact integer ratio (multiply through by n²)
    *   acf_num = n²·Σ(y_t·y_{t+k}) − n·S·(H_k+T_k) + (n−k)·S²
    *   acf_den = n·(n·Σy² − S²)
    * with H_k/T_k the head/tail partial sums — which fall out of the
    * SAME lag-pair aggregation (each t ≤ n−k appears in exactly one
    * k-pair). DECIMAL(38,0) throughout: S² alone leaves LONG for cent
    * series. The seasonality detector behind q118/q231's FIXED weekly
    * assumption — this measures which lag actually rings.
    *
    * Shape: lag pairing is a pure EQUI join — the lagged side explodes
    * each row into maxLag (t−k) keys, so no band scan and no n² blowup:
    * n·maxLag join rows per group, one aggregation each side. Output:
    * keyCols + (lag, n, acf_num, acf_den). */
  /** Lead–lag cross-correlation between two series on a shared integer
    * grid — "do purchases follow views, and by how many days?": for
    * each lag ∈ [0, maxLag], Pearson pieces over the pairs
    * (x at t, y at t+lag), all sums exact DECIMAL(38,0), plus the
    * pinned TWO-ROOT correlation
    *
    *   xcorr_e6 = (n·sxy − sx·sy)·1e6 div (isqrt(n·sxx−sx²) ·
    *              isqrt(n·syy−sy²))
    *
    * (isqrt(a)·isqrt(b), NOT isqrt(a·b) — the product of the variance
    * numerators overflows DECIMAL(38,0) at real magnitudes; the
    * two-root form is the documented convention, off the classical
    * value by at most the two ±1-ulp root truncations, and replayed
    * identically by the oracle). NULL when either variance numerator
    * is ≤ 0 (a constant side has no correlation to report).
    *
    * Shape: the lagged side explodes into maxLag+1 shifted copies and
    * pairs by EQUI join on the grid key (the acfSuffStats rule — no
    * band scan); everything downstream is lag-grain. Inputs are
    * expected at grid grain (daily/hourly census), so cost is
    * grid-bound, never raw-event-bound. */
  def crossCorrE6(x: DataFrame, xOrder: Column, xVal: Column,
      y: DataFrame, yOrder: Column, yVal: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val xa = x.select(xOrder.cast("long").as("__o"),
      xVal.cast("long").as("__xa"))
    val yb = y.select(yOrder.cast("long").as("__ob"),
        yVal.cast("long").as("__yb"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
      .withColumn("__o", col("__ob") - col("lag"))
    val stats = xa.join(yb, "__o")
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(count(lit(1)).as("n"),
        sum(d(col("__xa"))).cast("decimal(38,0)").as("__sx"),
        sum(d(col("__yb"))).cast("decimal(38,0)").as("__sy"),
        sum(d(col("__xa")) * col("__xa")).cast("decimal(38,0)").as("__sxx"),
        sum(d(col("__yb")) * col("__yb")).cast("decimal(38,0)").as("__syy"),
        sum(d(col("__xa")) * col("__yb")).cast("decimal(38,0)").as("__sxy"))
      .withColumn("num",
        (d(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
          .cast("decimal(38,0)"))
      .withColumn("dx",
        (d(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
          .cast("decimal(38,0)"))
      .withColumn("dy",
        (d(col("n")) * col("__syy") - col("__sy") * col("__sy"))
          .cast("decimal(38,0)"))
    def isqrt(in: String, out: String)(df: DataFrame): DataFrame =
      df.withColumn("__s0",
          expr(s"CAST(floor(sqrt(CAST($in AS DOUBLE))) AS BIGINT)"))
        .withColumn(out, expr(
          s"""CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > $in
             |   THEN __s0 - 1
             | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= $in
             |   THEN __s0 + 1
             | ELSE __s0 END""".stripMargin))
        .drop("__s0")
    val rooted = isqrt("__dy2", "__ry")(
      isqrt("__dx2", "__rx")(
        stats
          .withColumn("__dx2", expr(
            "greatest(dx, CAST(0 AS DECIMAL(38,0)))"))
          .withColumn("__dy2", expr(
            "greatest(dy, CAST(0 AS DECIMAL(38,0)))"))))
    rooted.select(col("lag"), col("n"), col("num"), col("dx"), col("dy"),
      expr("""CASE WHEN dx <= 0 OR dy <= 0 THEN NULL
             | ELSE CAST(num * 1000000
             |   div (CAST(__rx AS DECIMAL(38,0)) * __ry) AS BIGINT)
             | END""".stripMargin).as("xcorr_e6"))
  }

  def acfSuffStats(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__o"))
    val base = df
      .select(keys :+ orderCol.as("__o") :+ valueCol.cast("long").as("__y"): _*)
      .withColumn("__t", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val totals = base.groupBy(keys: _*).agg(count(lit(1)).as("n"),
      sum(d(col("__y"))).as("s"),
      sum(d(col("__y")) * d(col("__y"))).as("syy"))
    val lead = base.select(keys :+ col("__t").as("__tb") :+
        col("__y").as("__yb"): _*)
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("__ta", col("__tb") - col("lag"))
    base.select(keys :+ col("__t").as("__ta") :+ col("__y").as("__ya"): _*)
      .join(lead, keyCols :+ "__ta")
      .groupBy(keys :+ col("lag"): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(d(col("__ya"))).as("h"), sum(d(col("__yb"))).as("tl"),
        sum(d(col("__ya")) * d(col("__yb"))).as("sab"))
      .join(totals, keyCols)
      .select(keys ++ Seq(col("lag").cast("long").as("lag"), col("n"),
        (d(col("n")) * d(col("n")) * col("sab")
          - d(col("n")) * col("s") * (col("h") + col("tl"))
          + d(col("cnt")) * col("s") * col("s")).as("acf_num"),
        (d(col("n")) * (d(col("n")) * col("syy") - col("s") * col("s")))
          .as("acf_den")): _*)
  }

  /** ROLLING ordinary least squares — [[groupedOls]]'s closed form over
    * a trailing `window`-row frame per key, one row per observation:
    * the LOCAL trend a monitoring dashboard actually plots (the global
    * slope averages a regime change away; the rolling one shows it).
    * Same unreduced-exact-ratio discipline (slope_num/slope_den,
    * den = 0 ⇔ degenerate frame), quadratics in DECIMAL(38,0).
    *
    * Shape: five windowed running sums sharing ONE (key, order) sort —
    * a single exchange + sort, no self-join, no per-frame recompute.
    * Output: keyCols + (t, n, slope_num, slope_den). */
  def rollingOls(df: DataFrame, keyCols: Seq[String], orderCol: Column,
      valueCol: Column, window: Int): DataFrame = {
    require(window >= 2)
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__x"))
      .rowsBetween(-(window - 1), 0)
    val d = (c: Column) => c.cast("decimal(38,0)")
    df.select(keys :+ orderCol.cast("long").as("__x") :+
        valueCol.cast("long").as("__y"): _*)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(d(col("__x"))).over(w))
      .withColumn("__sy", sum(d(col("__y"))).over(w))
      .withColumn("__sxy", sum(d(col("__x")) * d(col("__y"))).over(w))
      .withColumn("__sxx", sum(d(col("__x")) * d(col("__x"))).over(w))
      .select(keys ++ Seq(col("__x").as("t"), col("__n").as("n"),
        (d(col("__n")) * col("__sxy") - col("__sx") * col("__sy"))
          .as("slope_num"),
        (d(col("__n")) * col("__sxx") - col("__sx") * col("__sx"))
          .as("slope_den")): _*)
  }

  /** Wald–Wolfowitz runs test for serial randomness (Wald & Wolfowitz
    * 1940) over an ORDERED series census: dichotomize each point
    * against the series mean (above = 1; at-or-below = 0, pinned),
    * count runs R of consecutive equal signs, and compare against the
    * null moments for n₁ above / n₂ below points:
    *
    *   E[R]·1e6   = 2·n₁·n₂·1e6 div n + 1e6
    *   Var[R]·1e12 = 2n₁n₂(2n₁n₂−n)·1e12 div (n²(n−1))
    *   z_e3       = (R·1e6 − E_e6)·1e3 div isqrt(Var_e12)
    *
    * — "are the above/below-mean days clustered (trend/regime) or
    * alternating (negative autocorrelation)", the model-free sibling
    * of [[acfSuffStats]]. All moments are exact DECIMAL(38,0) ratios
    * with one truncating division each; the root is the corrected
    * isqrt (exact). NULL z when n₁n₂ = 0 or n < 2 (degenerate).
    *
    * Scale shape: the input is already a bucket census (e.g. daily
    * totals — the caller's aggregate of the raw stream); the sign/lag
    * pass is one window over that census partitioned by the group
    * keys, then one aggregate to group grain. Census contract, not
    * data contract. */
  def runsTestE3(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      value: Column): DataFrame = {
    val gs = if (groupCols.isEmpty) Seq(lit(1).as("__g")) else groupCols.map(col)
    val gNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val base = df.select(gs :+ orderCol.cast("long").as("__o") :+
      value.cast("long").as("__v"): _*)
    val stats = base.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val w = Window.partitionBy(gNames.map(col): _*).orderBy(col("__o"))
    val signed = base.join(broadcast(stats), gNames)
      // above mean ⟺ v·n > S (exact cross-multiplication, no division)
      .withColumn("__sgn",
        when(expr("CAST(__v AS DECIMAL(38,0)) * __n > __s"), 1L)
          .otherwise(0L))
      .withColumn("__flip",
        when(lag(col("__sgn"), 1).over(w).isNull, 1L)
          .when(lag(col("__sgn"), 1).over(w) =!= col("__sgn"), 1L)
          .otherwise(0L))
    val perG = signed.groupBy(gNames.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__sgn")).as("n1"),
        sum(lit(1L) - col("__sgn")).as("n2"),
        sum(col("__flip")).as("runs"))
    perG.select(gNames.map(col) :+ col("n") :+ col("n1") :+ col("n2") :+
      col("runs") :+
      expr("""CAST(2 * CAST(n1 AS DECIMAL(38,0)) * n2 * 1000000 div n
            | + 1000000 AS BIGINT)""".stripMargin).as("mean_runs_e6") :+
      when(col("n") > 1L, expr(
        """CAST(2 * CAST(n1 AS DECIMAL(38,0)) * n2
          | * (2 * CAST(n1 AS DECIMAL(38,0)) * n2 - n)
          | * 1000000000000
          | div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))
          | AS DECIMAL(38,0))""".stripMargin))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")).as("var_e12"): _*)
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(var_e12 AS DOUBLE))) AS BIGINT)"))
      .withColumn("__r", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > var_e12
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= var_e12
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .withColumn("z_e3",
        when(col("n1") > 0L && col("n2") > 0L && col("n") > 1L &&
            col("__r") > 0L,
          expr("""CAST(CAST(runs * 1000000 - mean_runs_e6
                | AS DECIMAL(38,0)) * 1000 div __r AS BIGINT)"""
            .stripMargin)))
      .drop("__s0", "__r")
  }

  /** Newey–West / Bartlett-kernel long-run variance components (Newey
    * & West 1987) over an ordered series census — the
    * autocorrelation-robust error bar a time-sliced experiment readout
    * needs where the iid variance (q376) understates: consecutive
    * days co-move, so the effective sample is smaller.
    *
    * With m_e6 = S·1e6 div n (truncating) and the exact e6 deviations
    * d_t = v_t·1e6 − m_e6, per lag l ∈ [0, L]:
    *
    *   gamma_num(l) = Σ_t d_t·d_{t+l}        (calendar lag: pairs at
    *                                          order-distance exactly l
    *                                          on the observed grid)
    *   gamma_e12(l) = gamma_num div n         (NW convention: always n)
    *   bartlett_w_e6 = (L+1−l)·1e6 div (L+1)
    *   term_e12(l)  = gamma_e12              for l = 0
    *                = 2·(L+1−l)·gamma_num div ((L+1)·n)   for l > 0
    *
    * Σ_l term_e12 is the long-run variance; terms are emitted per lag
    * (the q380 lead–lag convention) so the consumer sees the
    * correlation structure, not just the sum. Products are
    * DECIMAL(38,0), divisions truncating, order pinned.
    *
    * Scale shape: the caller supplies the BUCKETED series (the raw
    * pass is their one aggregate); here a one-row stats broadcast, a
    * banded self-join on the census (|Δorder| ≤ L — census², bounded
    * by the time domain, never by data), one per-lag aggregate. */
  def neweyWestE12(df: DataFrame, orderCol: Column, value: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"Trend.neweyWestE12: need 1 ≤ maxLag ≤ 64, got $maxLag")
    val base = df.select(orderCol.cast("long").as("o"),
        value.cast("long").as("v"))
      .where(col("o").isNotNull && col("v").isNotNull)
    val stats = base.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("n"), expr(
        "CAST(CAST(s AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
        .as("m_e6"))
    val dev = base.crossJoin(broadcast(stats))
      .select(col("o"), col("n"),
        expr("v * 1000000 - m_e6").as("d"))
    val pairs = dev.as("x").join(
        dev.select(col("o").as("o2"), col("d").as("d2")).as("y"),
        expr(s"o2 - o BETWEEN 0 AND $maxLag"))
      .select((col("o2") - col("o")).as("lag"), col("n"),
        expr("CAST(d AS DECIMAL(38,0)) * d2").as("p"))
    // γ magnitudes are value²·1e12 — far past LONG, so quotients stay
    // DECIMAL(38,0) via an explicit truncate-TOWARD-ZERO division
    // (Spark `div` would silently NULL past BIGINT; `(a−pmod)/b` alone
    // floors toward −inf on negative cross-covariances, which DuckDB's
    // toward-zero `//` does not match)
    def tz(a: String, b: String): String =
      s"""CASE WHEN $a >= 0
         | THEN CAST(($a - pmod($a, $b)) / $b AS DECIMAL(38,0))
         | ELSE CAST(-((-($a) - pmod(-($a), $b)) / $b) AS DECIMAL(38,0))
         |END""".stripMargin
    pairs.groupBy(col("lag"))
      .agg(max(col("n")).as("n"), sum(col("p")).as("gamma_num"))
      .select(col("lag"), col("n"),
        expr(tz("gamma_num", "n")).as("gamma_e12"),
        expr(s"(${maxLag + 1} - lag) * 1000000 div ${maxLag + 1}")
          .as("bartlett_w_e6"),
        when(col("lag") === 0L, expr(tz("gamma_num", "n")))
          .otherwise(expr(tz(
            s"(2 * (${maxLag + 1} - lag) * gamma_num)",
            s"(${maxLag + 1} * CAST(n AS DECIMAL(38,0)))")))
          .as("term_e12"))
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; the R/S
    * method as in Mandelbrot & Wallis 1969) — long-range dependence of
    * a series: H ≈ 0.5 for a memoryless walk, H > 0.5 for persistent
    * (trending) series — the "is this metric self-similar across
    * scales" readout beside the single-scale ACF (q251) and runs test
    * (q390).
    *
    * Per window size w: split the rn-indexed census into FULL blocks
    * of w; within a block with sum S and cumulative sums cum_k, the
    * CLEARED cumulative deviations c_k = w·cum_k − k·S (≡ w·(cum_k −
    * k·x̄), integers; c_w = 0 so the zero anchor is included),
    * R_cleared = max c − min c, sd_cleared = isqrt(w·Q − S²)
    * (≡ w·σ_pop, corrected isqrt), and rs_e6 = R_cleared·1e6 div
    * sd_cleared — the w factors cancel exactly. mean_rs_e6 averages
    * blocks (div); H is the exact integer OLS slope of
    * round(ln(mean_rs)·1e3) on round(ln(w)·1e3) over the window sizes
    * (pinned-double lns, q100 rule).
    *
    * Scale shape: the input is a bucketed series census; the ×|windows|
    * union stays census-sized, block windows partition by (w, block)
    * (bounded frames), aggregates per block, a |windows|-row OLS.
    * Output one row per w: (w, n_blocks, mean_rs_e6, hurst_e6 — the
    * shared slope repeated). */
  def hurstRsE6(df: DataFrame, orderCol: Column, value: Column,
      windows: Seq[Int]): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 2),
      "Trend.hurstRsE6: window sizes must be ≥ 2")
    val base0 = df.select(orderCol.cast("long").as("o"),
      value.cast("long").as("x"))
    val wOrd = Window.partitionBy(Census.onePartKey(col("o"))).orderBy(col("o"))
    val whole = Window.partitionBy(Census.onePartKey(col("o"))).orderBy(col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = base0.withColumn("rn",
        Census.guardLong(row_number().over(wOrd).cast("long"),
          count(lit(1)).over(whole), "Trend.hurstRsE6"))
      .truncate(true)
    val tagged = windows.map(w => base.withColumn("w", lit(w.toLong)))
      .reduce(_ unionByName _)
      .withColumn("blk", expr("(rn - 1) div w"))
      .withColumn("kin", expr("rn - blk * w"))
    val wb = Window.partitionBy(col("w"), col("blk")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wbAll = Window.partitionBy(col("w"), col("blk"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dev = tagged
      .withColumn("nb", count(lit(1)).over(wbAll))
      .where(col("nb") === col("w"))
      .withColumn("cum", sum(col("x")).over(wb))
      .withColumn("sb", sum(col("x")).over(wbAll))
      .withColumn("c", expr("w * cum - kin * sb"))
    val blocks = dev.groupBy(col("w"), col("blk"))
      .agg((max(col("c")) - min(col("c"))).as("r_cleared"),
        max(col("sb")).as("sb"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qb"))
      .withColumn("__v", expr(
        "w * qb - CAST(sb AS DECIMAL(38,0)) * sb"))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__v AS DOUBLE))) AS BIGINT)"))
      .withColumn("sd_cleared", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __v
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __v
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .where(col("sd_cleared") > 0L)
      .withColumn("rs_e6", expr(
        "CAST(CAST(r_cleared AS DECIMAL(38,0)) * 1000000 div sd_cleared AS BIGINT)"))
    val perW = blocks.groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("rs_e6")).as("__srs"))
      .withColumn("mean_rs_e6", expr("__srs div n_blocks"))
      .truncate(true)
    val pts = perW.select(
      expr("CAST(round(ln(CAST(w AS DOUBLE)) * 1000.0) AS BIGINT)")
        .as("lx"),
      expr("CAST(round(ln(CAST(mean_rs_e6 AS DOUBLE)) * 1000.0) AS BIGINT)")
        .as("ly"))
    val ols = pts.agg(count(lit(1)).as("np"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(expr("lx * ly")).as("sxy"), sum(expr("lx * lx")).as("sxx"))
      .select(when(expr("np * sxx - sx * sx") > 0L, expr(
        """CAST(CAST(np * sxy - sx * sy AS DECIMAL(38,0)) * 1000000
          |div (np * sxx - sx * sx) AS BIGINT)""".stripMargin))
        .as("hurst_e6"))
    perW.select(col("w"), col("n_blocks"), col("mean_rs_e6"))
      .crossJoin(broadcast(ols))
  }

  /** Trend/seasonal STRENGTH of a decomposed series (Wang, Smith &
    * Hyndman 2006; the tsfeatures F_T/F_S): how much of the
    * detrended/deseasonalized variation the remainder fails to
    * explain,
    *
    *   F_T·1e6 = max(0, 1e6 − Var(R)·1e6 div Var(T+R))
    *   F_S·1e6 = max(0, 1e6 − Var(R)·1e6 div Var(S+R))
    *
    * over the [[classicalDecompose]] output — the two-number "is there
    * actually a trend / a weekly cycle here" summary a monitoring
    * pipeline gates alerts on. Variances are cleared-denominator exact
    * DECIMAL numerators (the q376 identity — the n² cancels in the
    * ratio); one truncating division each, clamp at 0 via greatest
    * (the ratio exceeds 1 when the remainder out-varies the
    * component). NULL when the denominator variance is 0.
    *
    * Shape: ONE aggregate over the decomposed census per key. */
  def seasonalStrengthE6(decomposed: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val base = decomposed.select(keyCols.map(col) ++ Seq(
      col("remainder").as("r"),
      (col("trend") + col("remainder")).as("u"),
      (col("seasonal") + col("remainder")).as("s")): _*)
    base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("r")).as("sr"), sum(d(col("r")) * col("r")).as("qr"),
        sum(col("u")).as("su"), sum(d(col("u")) * col("u")).as("qu"),
        sum(col("s")).as("ss"), sum(d(col("s")) * col("s")).as("qs"))
      .withColumn("__vr",
        expr("n * qr - CAST(sr AS DECIMAL(38,0)) * sr"))
      .withColumn("__vu",
        expr("n * qu - CAST(su AS DECIMAL(38,0)) * su"))
      .withColumn("__vs",
        expr("n * qs - CAST(ss AS DECIMAL(38,0)) * ss"))
      .select(keyCols.map(col) :+ col("n") :+
        when(col("__vu") > 0L, greatest(lit(0L), expr(
          "CAST(1000000 - __vr * 1000000 div __vu AS BIGINT)")))
          .as("trend_strength_e6") :+
        when(col("__vs") > 0L, greatest(lit(0L), expr(
          "CAST(1000000 - __vr * 1000000 div __vs AS BIGINT)")))
          .as("seasonal_strength_e6"): _*)
  }

  /** Durbin–Watson autocorrelation statistic (Durbin & Watson 1950) on
    * the residuals of the simple OLS y ~ x — the serial-correlation
    * screen every trend regression (q254's rolling OLS, q230's
    * Theil–Sen) should report beside its slope: DW ≈ 2 under
    * independent errors, → 0 under positive autocorrelation (the
    * usual time-series reality that invalidates naive OLS standard
    * errors, the q395 Newey–West motivation).
    *
    * Determinism: x recenters to x − min(x) (residual-invariant;
    * keeps the doubles well-conditioned), the OLS moments are exact
    * DECIMAL(38,0) integers, each residual is ONE pinned double chain
    * rounded to e3 BEFORE any summation (the q374 rule)
    *   E_t = round((y − (Sy − b·Sx)/n − b·x)·1e3),
    *   b = Sxyₙ / Sxxₙ as a double of exact integers,
    * and DW_e6 = Σ(E_t − E_{t−1})²·1e6 div ΣE_t² is pure integer.
    *
    * Input convention: one row per x (a time-bucket census — the
    * caller aggregates y per bucket first); duplicate x collapse by
    * SUM. Output one row: (n_points, dw_e6 — NULL when Sxx* = 0 or
    * every residual rounds to 0).
    *
    * Scale shape: one hash aggregate to the bucket census, one
    * moments aggregate, one lag window over the census (constant
    * [[Census.onePartKey]] partition). */
  def durbinWatsonE6(df: DataFrame, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base0 = df.select(x.cast("long").as("x0"),
        y.cast("long").as("y"))
      .where(col("x0").isNotNull && col("y").isNotNull)
      .groupBy(col("x0")).agg(sum(col("y")).as("y"))
    val mn = broadcast(base0.agg(min(col("x0")).as("__mn")))
    val base = base0.crossJoin(mn)
      .select((col("x0") - col("__mn")).as("x"), col("y"))
    val s = broadcast(base.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy")))
    val w = Window.partitionBy(Census.onePartKey(col("x")))
      .orderBy(col("x"))
    base.crossJoin(s)
      .withColumn("__sxxs", expr("n * sxx - sx * sx"))
      .withColumn("__sxys", expr("n * sxy - sx * sy"))
      .withColumn("e3", expr(
        """CASE WHEN __sxxs = 0 THEN NULL
          | ELSE CAST(round((CAST(y AS DOUBLE)
          |  - (CAST(sy AS DOUBLE)
          |     - (CAST(__sxys AS DOUBLE) / CAST(__sxxs AS DOUBLE))
          |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
          |  - (CAST(__sxys AS DOUBLE) / CAST(__sxxs AS DOUBLE))
          |    * CAST(x AS DOUBLE)) * 1000.0) AS BIGINT) END"""
          .stripMargin))
      .withColumn("lagE", lag(col("e3"), 1).over(w))
      .agg(count(lit(1)).as("n_points"),
        sum(expr(
          """CASE WHEN lagE IS NULL THEN CAST(0 AS DECIMAL(38,0))
            | ELSE CAST(e3 - lagE AS DECIMAL(38,0)) * (e3 - lagE)
            |END""".stripMargin)).as("__num"),
        sum(expr("CAST(e3 AS DECIMAL(38,0)) * e3")).as("__den"))
      .select(col("n_points"),
        when(col("__den") > 0L,
          expr("CAST(__num * 1000000 div __den AS BIGINT)"))
          .as("dw_e6"))
  }
}
