package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald's sequential probability ratio test (Wald 1945) over an event
  * stream at bucket grain — the always-on A/B monitor that stops a
  * losing test EARLY instead of waiting for the fixed-horizon readout:
  * per time bucket, cumulative trials n and successes s, the Bernoulli
  * log-likelihood ratio
  *
  *   llr_e6(t) = s_t·L1 + (n_t − s_t)·L0
  *   L1 = round(ln(p1/p0)·1e6),  L0 = round(ln((1−p1)/(1−p0))·1e6)
  *
  * against Wald's boundaries A = round(ln((1−β)/α)·1e6),
  * B = round(ln(β/(1−α))·1e6); decision = reject_h0 (≥ A), accept_h0
  * (≤ B), else continue. Both L-constants and both boundaries are ONE
  * pinned double chain each, rendered from the caller's e6 rationals —
  * identical text in the oracle, so the whole trajectory hash-gates.
  *
  * Scale shape: one hash aggregate collapses the stream to the time-
  * bucket census (the only data pass); the cumulation is a guarded
  * census window. llr stays LONG to n ≈ 1e12 trials (|L| < 1e7). */
object Sequential {

  def sprtTrajectoryE6(df: DataFrame, bucket: Column, success: Column,
      p0E6: Long, p1E6: Long, alphaE6: Long, betaE6: Long): DataFrame = {
    require(p0E6 > 0L && p0E6 < 1000000L && p1E6 > 0L && p1E6 < 1000000L
      && p0E6 != p1E6, s"sprtTrajectoryE6: p0=$p0E6 p1=$p1E6")
    require(alphaE6 > 0L && alphaE6 < 1000000L && betaE6 > 0L &&
      betaE6 < 1000000L, s"sprtTrajectoryE6: α=$alphaE6 β=$betaE6")
    val census = df.select(bucket.cast("long").as("b"),
        success.cast("boolean").as("x"))
      .where(col("b").isNotNull && col("x").isNotNull)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("x"), 1L).otherwise(0L)).as("s_at"))
    val w = Window.partitionBy(Census.onePartKey(col("b")))
      .orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("b")))
      .orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val l1 = s"CAST(round(ln((0.0 + $p1E6) / $p0E6) * 1000000.0) AS BIGINT)"
    val l0 = s"CAST(round(ln((0.0 + ${1000000L - p1E6})" +
      s" / ${1000000L - p0E6}) * 1000000.0) AS BIGINT)"
    val up = s"CAST(round(ln((0.0 + ${1000000L - betaE6})" +
      s" / $alphaE6) * 1000000.0) AS BIGINT)"
    val lo = s"CAST(round(ln((0.0 + $betaE6)" +
      s" / ${1000000L - alphaE6}) * 1000000.0) AS BIGINT)"
    census
      .withColumn("n_cum", Census.guardLong(sum(col("n_at")).over(w),
        count(lit(1)).over(whole), "Sequential.sprtTrajectoryE6"))
      .withColumn("s_cum", sum(col("s_at")).over(w))
      .withColumn("llr_e6",
        expr(s"s_cum * $l1 + (n_cum - s_cum) * $l0"))
      .withColumn("decision", expr(
        s"""CASE WHEN llr_e6 >= $up THEN 'reject_h0'
           |     WHEN llr_e6 <= $lo THEN 'accept_h0'
           |     ELSE 'continue' END""".stripMargin))
      .select(col("b").as("bucket"), col("n_at"), col("s_at"),
        col("n_cum"), col("s_cum"), col("llr_e6"), col("decision"))
  }
}
