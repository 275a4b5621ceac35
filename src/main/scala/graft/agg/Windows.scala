package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window aggregation helpers (epoch-millis convention).
  *
  * Batch analogues of the reference's sliding counters
  * (P:common/functions/SlidingCounter.java:38-292, SlidingHourlyCounter,
  * SlidingDailyCounter) and the CUMULATE content-metrics window
  * (P:job/contentmetrics/resources/10_create_view_cumulated_content_metrics
  * .sql). Streaming forms use the same column shapes with
  * `window($"ts", size, slide)` + watermark.
  *
  * Scale: sliding windows explode each row into size/slide window
  * assignments *before* the shuffle, so partial (map-side) aggregation
  * applies and shuffled bytes are (rows · windowsPerRow) pre-combined per
  * partition — the same trade the reference makes with sub-bucketed
  * MapState.
  */
object Windows {

  /** Floor `tsMs` to a `sizeMs` bucket — exact integer arithmetic. */
  def bucket(tsMs: Column, sizeMs: Long): Column =
    (tsMs - pmod(tsMs, lit(sizeMs))).cast("long")

  /** Epoch-aligned sliding windows: emits one row per (keys, window_start).
    * windowsPerRow = sizeMs/slideMs must divide evenly. */
  def slidingCount(df: DataFrame, keys: Seq[String], tsMs: String,
      sizeMs: Long, slideMs: Long): DataFrame = {
    require(sizeMs % slideMs == 0, "slide must divide size")
    val k = (sizeMs / slideMs).toInt
    val base = bucket(col(tsMs), slideMs)
    val starts = sequence(lit(0), lit(k - 1)).cast("array<long>")
    df.withColumn("window_start_ms", explode(transform(starts, i => base - i * slideMs)))
      .groupBy((col("window_start_ms") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Tumbling-window counts per key. */
  def tumblingCount(df: DataFrame, keys: Seq[String], tsMs: String,
      sizeMs: Long): DataFrame =
    df.groupBy((bucket(col(tsMs), sizeMs).as("window_start_ms") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"))

  /** CUMULATE analogue: per (keys, span) running totals stepped by `stepMs`.
    * Output rows: one per (keys, span_start, step_end) with the cumulative
    * count from span start through that step. */
  def cumulativeCount(df: DataFrame, keys: Seq[String], tsMs: String,
      spanMs: Long, stepMs: Long): DataFrame = {
    val stepped = df
      .withColumn("span_start_ms", bucket(col(tsMs), spanMs))
      .withColumn("step_ms", bucket(col(tsMs), stepMs))
      .groupBy((Seq("span_start_ms", "step_ms").map(col) ++ keys.map(col)): _*)
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy((col("span_start_ms") +: keys.map(col)): _*)
      .orderBy(col("step_ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped.withColumn("cum_n", sum(col("__n")).over(w)).drop("__n")
  }

  /** Last-seen + count per key (reference LastTimeAndCount,
    * P:common/functions/LastTimeAndCount.java:36-299). */
  def lastTimeAndCount(df: DataFrame, keys: Seq[String], tsMs: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(max(col(tsMs)).as("last_ts_ms"), count(lit(1)).as("n"))
}
