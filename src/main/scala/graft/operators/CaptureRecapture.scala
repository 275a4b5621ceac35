package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample capture–recapture population estimation — Chapman's
  * bias-corrected Lincoln–Petersen estimator (Chapman 1951; Seber, The
  * Estimation of Animal Abundance): units "captured" in two occasions,
  *   N̂ = (n₁+1)(n₂+1) div (m+1) − 1
  *   V̂ = (n₁+1)(n₂+1)(n₁−m)(n₂−m) div ((m+1)²(m+2))
  * with m the recaptures (units in both). The audit row carries the
  * TRUE population of the observed stream beside the estimate — the
  * "how much of the user base do two overlapping windows actually see"
  * readout (N̂ well above the union flags heavy non-overlap; the true
  * count is only available here because this is an audit gate).
  *
  * All DECIMAL(38,0) products with truncating div — hash-gates at any
  * scale. Shape: one distinct per occasion (hash aggregates), one
  * census join for m, scalar algebra on a one-row frame. */
object CaptureRecapture {

  def chapmanAudit(df: DataFrame, unit: Column, occ1: Column,
      occ2: Column): DataFrame = {
    val base = df.select(unit.as("u"), occ1.as("o1"), occ2.as("o2"))
      .where(col("u").isNotNull)
      .groupBy(col("u"))
      .agg(max(when(col("o1"), 1L).otherwise(0L)).as("in1"),
        max(when(col("o2"), 1L).otherwise(0L)).as("in2"))
    base.agg(
        count(lit(1)).as("n_true"),
        sum(col("in1")).as("n1"),
        sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("m"))
      .select(col("n_true"), col("n1"), col("n2"), col("m"),
        expr(
          """CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)
            | div (m + 1) - 1 AS BIGINT)""".stripMargin)
          .as("chapman_nhat"),
        expr(
          """CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1)
            | * (n1 - m) * (n2 - m)
            | div (CAST(m + 1 AS DECIMAL(38,0)) * (m + 1) * (m + 2))
            | AS BIGINT)""".stripMargin).as("var_nhat"))
  }
}
