package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Split-conformal prediction intervals (Papadopoulos et al. 2002;
  * Vovk's inductive conformal predictors; the Lei et al. 2018 JASA
  * formulation) — the distribution-free coverage guarantee every model
  * evaluation pipeline wants: calibrate a score threshold q̂ on a held-out
  * split so that prediction intervals ±q̂ cover a fresh point with
  * probability ≥ 1−α, no matter what the model or the data distribution.
  *
  * Mondrian (per-group) variant: each group gets its own predictor and
  * its own q̂, so coverage holds within every group, not just on average.
  */
object Conformal {

  /** Per-group split-conformal interval calibration + held-out coverage
    * audit, everything in exact integer arithmetic:
    *
    *  - predictor: the calibration split's per-group mean, floor-divided
    *    (`sum div n` — deterministic fixed-point, never a double)
    *  - nonconformity score: absolute residual |y − pred|
    *  - q̂: the ⌈(1−α)(n_cal+1)⌉-th smallest calibration residual — the
    *    finite-sample rank that makes coverage ≥ 1−α marginally; capped
    *    at n_cal for degenerate tiny groups (the uncapped rank would mean
    *    "infinite interval"; the cap reports the group max instead, and
    *    n_cal in the output lets consumers spot those groups)
    *  - audit: on the disjoint test split, how many points actually fall
    *    inside ±q̂.
    *
    * Scale shape: one aggregation for the predictors (map-side combine,
    * broadcast back), then [[ExactQuantiles.quantiles]]'s sample-then-
    * refine exact selection for q̂ — O(sample + band) shuffle instead of a
    * per-group sort, the same machinery as q89 — then one more scan for
    * the coverage counts. No global sort, no per-group windows over the
    * full data; group count is assumed small (Mondrian taxonomy classes),
    * rows per group unbounded.
    *
    * `alphaPct` is the PERCENT version of 1−α (e.g. 90 for α = 0.1) so the
    * target rank stays in integer arithmetic end-to-end.
    *
    * Output: one row per group —
    * (group, pred, n_cal, qhat, n_test, covered). */
  def splitConformal(df: DataFrame, groupCol: Column, isCalib: Column,
      outcome: Column, rowKey: Column, alphaPct: Int = 90): DataFrame = {
    val base = df.select(groupCol.as("grp"), isCalib.as("__cal"),
        outcome.cast("long").as("__y"), rowKey.as("__k"))
      .where(col("__y").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val preds = base.where(col("__cal"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_cal"), sum(col("__y")).as("__s"))
        .withColumn("pred", expr("__s div n_cal"))
        .drop("__s")
      val resid = base.join(broadcast(preds), Seq("grp"))
        .withColumn("__r", abs(col("__y") - col("pred")))
      val qhat = ExactQuantiles.quantiles(
          resid.where(col("__cal")), Seq("grp"), col("__r"), col("__k"),
          percents = Seq(alphaPct), plusOne = true)
        .select(col("grp"), col("quantile").as("qhat"))
      resid.where(!col("__cal"))
        .join(broadcast(qhat), Seq("grp"))
        .groupBy(col("grp"), col("qhat"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("__r") <= col("qhat"), 1L).otherwise(0L))
            .as("covered"))
        .join(broadcast(preds), Seq("grp"))
        .select(col("grp"), col("pred"), col("n_cal"), col("qhat"),
          col("n_test"), col("covered"))
        // the result outlives base.unpersist() below — pin it
        .truncate(true)
    } finally base.unpersist(): Unit
  }
}
