package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
