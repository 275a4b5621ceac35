package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-key outlier flagging by median absolute deviation — the
  * telemetry anomaly rule (|x − median| > t·MAD) that, unlike z-scores,
  * is not itself dragged by the outliers it hunts (50% breakdown point;
  * Hampel 1974).
  *
  * Exactness discipline: medians are LOWER medians picked by integer rank
  * selection over a (key, value) histogram — the q48 quantile shape: a
  * partial-agg histogram, a cumulative-count window, and
  * `min(value | 2·cum ≥ n)`. No interpolation, no float averaging of two
  * middle elements, so every produced number is either an input value or
  * a single IEEE subtraction/multiply of input values — bit-reproducible
  * across engines, which is what lets the q70 gate hash-match outlier
  * verdicts on raw doubles.
  *
  * Shape: two histogram aggregations + two joins, all keyed on the series
  * key (one shuffle partitioning reused); histograms are |distinct
  * values| per key, far below row counts for real telemetry. */
object Anomaly {

  /** Lower median per key via integer rank selection. */
  private def lowerMedian(df: DataFrame, out: String): DataFrame = {
    val hist = df.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy(col("k")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("k"))))
      .groupBy(col("k"))
      .agg(min(when(col("cum") * 2 >= col("n"), col("v"))).as(out))
  }

  /** EWMA forecast residuals (the control-chart rule of Roberts 1959:
    * smooth s_i = α·x_i + (1−α)·s_{i−1}, s_1 = x_1; flag the newest
    * observation when it deviates from the forecast — the EWMA of its
    * prefix — by more than a caller-supplied band, e.g. L·σ with σ from
    * [[madOutliers]]'s robust scale).
    *
    * Exactness discipline: the fold is multiplies and adds of doubles in
    * ONE pinned left-fold order (sorted by (ts, value)), no
    * transcendentals — so even the raw double EWMA is bit-reproducible
    * cross-engine (the q75 gate hashes it). β = 1−α is spelled as the
    * SUBTRACTION on both engines: double(1.0−0.2) ≠ double(0.8).
    *
    * Scale shape: one groupBy; each key's series is collected and folded
    * in its executor — the same per-key-sequence-fits-in-memory contract
    * as the reference's keyed process functions (and this engine's
    * sessionize/cogroup). Keys are independent; skewed series lengths
    * cost memory on one executor, never a driver hop. */
  def ewmaResiduals(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, alpha: Double, band: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0 && band > 0.0)
    val beta = 1.0 - alpha
    def fold(arr: org.apache.spark.sql.Column) = aggregate(
      slice(arr, lit(2), size(arr) - 1), element_at(arr, 1),
      (acc, x) => lit(alpha) * x + lit(beta) * acc)
    val series = df
      .select(col(keyCol).as("k"), col(tsCol).as("ts"), col(valueCol).as("v"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("ts"), col("v")))).as("arr"),
        count(lit(1)).as("n_obs"))
      .withColumn("vs", transform(col("arr"), e => e.getField("v")))
    series.select(
        col("k").as(keyCol), col("n_obs"),
        fold(col("vs")).as("ewma"),
        element_at(col("vs"), -1).as("last_value"),
        when(col("n_obs") >= 2,
          element_at(col("vs"), -1) -
            fold(slice(col("vs"), lit(1), size(col("vs")) - 1))).as("residual"))
      .withColumn("is_spike",
        coalesce(abs(col("residual")) > lit(band), lit(false)))
  }

  /** One-sided CUSUM drift detection (Page 1954; the control-chart form) —
    * per key, accumulate deviations above the key's own baseline and flag
    * when the accumulation crosses a threshold: the standard changepoint
    * monitor for "this metric has drifted up", complementary to the
    * point-spike EWMA residual and the distributional MAD rule.
    *
    * S_i = max(0, S_{i−1} + (v_i − μ_k − κ)) has the closed prefix form
    * S_i = P_i − min(0, min_{j≤i} P_j) with P the running sum of
    * deviations — so the whole recurrence is TWO window functions over one
    * (key, ts, id) sort: no fold, no collected series, no state. That is
    * the load-bearing scale decision: a 100 TB events table runs this as
    * one exchange + one sort per key partition, streaming through rows.
    *
    * Exactness: values quantize to e6 BIGINTs first; baseline μ_k is the
    * truncating integer mean over the key; every P/S/threshold compare is
    * LONG arithmetic — bit-identical on any engine, any partitioning.
    *
    * Output per key: n_obs, max_s_e6 (peak accumulated drift), n_alarms
    * (observations with S > threshold), first_alarm_ts (ms; −1 when the
    * key never alarms — a sentinel, not null, so gate comparison and
    * downstream filters stay integer-typed). */
  def cusumDrift(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, slackE6: Long, thresholdE6: Long): DataFrame = {
    require(thresholdE6 > 0)
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("k"))
    val ordered = byKey.orderBy(col("ts"), col("v_e6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      round(col(valueCol) * lit(1000000.0)).cast("long").as("v_e6"))
    e.withColumn("v_sum", sum(col("v_e6")).over(byKey))
      .withColumn("v_cnt", count(lit(1)).over(byKey))
      .withColumn("mu", expr("v_sum div v_cnt"))
      .withColumn("p", sum(col("v_e6") - col("mu") - lit(slackE6)).over(ordered))
      .withColumn("s", col("p") - least(min(col("p")).over(ordered), lit(0L)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_obs"), max(col("s")).as("max_s_e6"),
        sum(when(col("s") > lit(thresholdE6), 1L).otherwise(0L)).as("n_alarms"),
        coalesce(min(when(col("s") > lit(thresholdE6), col("ts"))), lit(-1L))
          .as("first_alarm_ts"))
      .select(col("k").as(keyCol), col("n_obs"), col("max_s_e6"),
        col("n_alarms"), col("first_alarm_ts"))
  }

  /** Per-event CUSUM points under a KNOWN target — the batch replay of
    * [[graft.streaming.CusumTws]]'s online fold (same two-window prefix
    * form as [[cusumDrift]], fixed μ instead of the per-key empirical
    * mean; CusumTwsSpec pins streaming ≡ this). Output: (keyCol, tsCol,
    * v_e6, s_e6, alarmed). */
  def cusumPoints(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, targetE6: Long, slackE6: Long, thresholdE6: Long)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col("k")).orderBy(col("ts"), col("v_e6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        round(col(valueCol) * lit(1000000.0)).cast("long").as("v_e6"))
      .withColumn("p",
        sum(col("v_e6") - lit(targetE6) - lit(slackE6)).over(ordered))
      .withColumn("s_e6", col("p") - least(min(col("p")).over(ordered), lit(0L)))
      .select(col("k").as(keyCol), col("ts").as(tsCol), col("v_e6"),
        col("s_e6"), (col("s_e6") > lit(thresholdE6)).as("alarmed"))
  }

  /** Flags rows where |value − median| > (num/den)·MAD. Output:
    * (keyCol, tsCol, valueCol, deviation, is_outlier). A key whose MAD is
    * 0 (over half its values identical) flags every deviating row — the
    * standard MAD-rule degeneracy, deliberate and documented. */
  def madOutliers(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, thresholdNum: Long, thresholdDen: Long = 1L)
      : DataFrame = {
    require(thresholdNum > 0 && thresholdDen > 0)
    val e = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(valueCol).as("v"))
    val med = lowerMedian(e, "med")
    val dev = e.join(med, "k").withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.select(col("k"), col("dev").as("v")), "mad")
    dev.join(mad, "k")
      .select(col("k").as(keyCol), col("ts").as(tsCol),
        col("v").as(valueCol), col("dev").as("deviation"),
        (col("dev") * lit(thresholdDen.toDouble) >
          col("mad") * lit(thresholdNum.toDouble)).as("is_outlier"))
  }

  /** Seasonal-naive residuals: each point minus the key's latest value
    * observed one season (`periodMs`) earlier, within a ±0 / −`toleranceMs`
    * staleness allowance — i.e. the baseline row is the latest event with
    * ts ∈ [t − periodMs − toleranceMs, t − periodMs]. The standard
    * first-difference-at-lag-one-season detrending for daily/weekly
    * periodicity; residuals then feed any of the repo's outlier rules
    * (fixed threshold, MAD, CUSUM).
    *
    * Shape: ONE window pass per key — a RANGE frame over the event-time
    * millis picks `max(struct(ts, rowKey, value))`, whose lexicographic
    * order IS the deterministic "latest ts, tie to largest rowKey"
    * semantics, with no self-join and no per-point probe. Irregular
    * series need no gap-fill: the range frame is defined in time, not
    * rows. Points with an empty frame emit NULL baseline (the warm-up
    * season), left to the caller to filter — dropping them here would
    * hide coverage gaps.
    *
    * Output: key, rowKey, ts, value, baseline_ts, baseline_value,
    * residual (all value math on the caller's integer fixed-point). */
  def seasonalResiduals(df: DataFrame, keyCol: String, rowKeyCol: String,
      tsCol: String, valueCol: String, periodMs: Long,
      toleranceMs: Long): DataFrame = {
    require(periodMs > 0 && toleranceMs >= 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rangeBetween(-periodMs - toleranceMs, -periodMs)
    df
      .withColumn("__b",
        max(struct(col(tsCol), col(rowKeyCol), col(valueCol))).over(w))
      .select(col(keyCol), col(rowKeyCol), col(tsCol), col(valueCol),
        col(s"__b.$tsCol").as("baseline_ts"),
        col(s"__b.$valueCol").as("baseline_value"),
        (col(valueCol) - col(s"__b.$valueCol")).as("residual"))
  }
}
