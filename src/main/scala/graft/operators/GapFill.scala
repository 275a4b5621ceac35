package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill: densify each key's bucket sequence between its
  * first and last observation and carry the last observed value forward —
  * the regularization step before joining telemetry/metrics series of
  * different cadences (Flink SQL exposes it as a table-valued gap-fill;
  * feature stores call it forward-fill).
  *
  * Shape: per-key bucket span from one partial-agg pass; missing buckets
  * generate from a `sequence` explode (rows appear only for the gaps, no
  * cross join against a calendar table); the carry-forward is ONE
  * `last_value(ignoreNulls)` window over the union — a single sort within
  * the key partitions that the explode's partitioning already co-located.
  * Gap volume is bounded by span/bucket per key; a key with a pathological
  * span caps via `maxBucketsPerKey` (fails loudly rather than exploding a
  * runaway range).
  *
  * Output: (key, bucket_ms, value, observed) — every bucket in each key's
  * span, `observed` false on filled rows. */
object GapFill {

  def forwardFill(df: DataFrame, keyCol: String, tsMsCol: String,
      valueCol: String, bucketMs: Long, maxBucketsPerKey: Long = 1000000L)
      : DataFrame = {
    require(bucketMs > 0)
    val obs = df.select(col(keyCol).as("k"),
      (col(tsMsCol) - pmod(col(tsMsCol), lit(bucketMs))).as("b"),
      col(valueCol).as("v"))
      // last observation per (key, bucket) wins, deterministically: the
      // max value breaks intra-bucket ties so the fill source is stable
      .groupBy(col("k"), col("b")).agg(max(col("v")).as("v"))
    val spans = obs.groupBy(col("k"))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
    // fail loudly on runaway spans instead of materializing them; the
    // guard rides the `hi` bound itself so column pruning can't drop it
    val guarded = spans.withColumn("hi",
      when((col("hi") - col("lo")) / lit(bucketMs) + 1d <= maxBucketsPerKey,
        col("hi"))
        .otherwise(raise_error(concat(lit(s"gap fill span exceeds " +
          s"$maxBucketsPerKey buckets for key "), col("k").cast("string")))
          .cast("long")))
    val grid = guarded.select(col("k"),
      explode(sequence(col("lo"), col("hi"), lit(bucketMs))).as("b"))
    val joined = grid.join(obs, Seq("k", "b"), "left")
    val w = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("observed", col("v").isNotNull)
      .withColumn("v", last(col("v"), ignoreNulls = true).over(w))
      .select(col("k").as(keyCol), col("b").as("bucket_ms"),
        col("v").as(valueCol), col("observed"))
  }

  /** Linear-interpolation gap fill — the resampling sibling of
    * [[forwardFill]] for metrics where a step function misstates the
    * gap (a counter that kept growing during an outage): each missing
    * bucket takes the EXACT integer interpolation between its bracketing
    * observations,
    *
    *   v = v_prev + (v_next − v_prev)·(b − b_prev) div (b_next − b_prev)
    *
    * truncating toward zero — pure BIGINT, hash-gateable. Values must be
    * integer-typed (cast upstream); the span runs first→last observation
    * per key so every gap is bracketed (no extrapolation).
    *
    * Shape: identical to forwardFill plus one backward-looking and one
    * forward-looking window over the SAME (key, bucket) sort — Catalyst
    * plans both frames off a single exchange+sort. */
  def linearFill(df: DataFrame, keyCol: String, tsMsCol: String,
      valueCol: String, bucketMs: Long, maxBucketsPerKey: Long = 1000000L)
      : DataFrame = {
    require(bucketMs > 0)
    val obs = df.select(col(keyCol).as("k"),
      (col(tsMsCol) - pmod(col(tsMsCol), lit(bucketMs))).as("b"),
      col(valueCol).cast("long").as("v"))
      .groupBy(col("k"), col("b")).agg(max(col("v")).as("v"))
    val spans = obs.groupBy(col("k"))
      .agg(min(col("b")).as("lo"), max(col("b")).as("hi"))
    val guarded = spans.withColumn("hi",
      when((col("hi") - col("lo")) / lit(bucketMs) + 1d <= maxBucketsPerKey,
        col("hi"))
        .otherwise(raise_error(concat(lit(s"gap fill span exceeds " +
          s"$maxBucketsPerKey buckets for key "), col("k").cast("string")))
          .cast("long")))
    val grid = guarded.select(col("k"),
      explode(sequence(col("lo"), col("hi"), lit(bucketMs))).as("b"))
    val joined = grid.join(obs, Seq("k", "b"), "left")
    val wPrev = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("k")).orderBy(col("b"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsB = when(col("v").isNotNull, col("b"))
    joined
      .withColumn("observed", col("v").isNotNull)
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(obsB, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(obsB, ignoreNulls = true).over(wNext))
      .withColumn("v", when(col("observed"), col("v"))
        .otherwise(expr("pv + (nv - pv) * (b - pb) div (nb - pb)")))
      .select(col("k").as(keyCol), col("b").as("bucket_ms"),
        col("v").as(valueCol), col("observed"))
  }
}
