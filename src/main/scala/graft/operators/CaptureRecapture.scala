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

  /** Schnabel multi-sample capture–recapture (Schnabel 1938; Seber §4):
    * the k-occasion generalization of [[chapmanAudit]] — per occasion t
    * (in occasion order) the catch C_t, the recaptures R_t (units
    * already marked), the marked-before count M_t, and the RUNNING
    * Schnabel estimate
    *
    *   N̂_t·1e6 = (Σ_{s≤t} C_s·M_s)·1e6 div (Σ_{s≤t} R_s)
    *
    * (0 while no recapture has happened — the estimator is undefined
    * there and the trajectory says so loudly). The pipeline use: watch
    * the population estimate CONVERGE as capture occasions accumulate —
    * "how many more crawl/observation rounds until the user-base
    * estimate stabilizes", the trajectory sibling of q437's two-sample
    * audit row.
    *
    * Scale shape: one distinct to (unit, occasion) grain, a per-unit
    * min for first capture (both map-side-combinable hash aggregates),
    * then everything lives on the OCCASION census — cumulative windows
    * under the constant [[Census.onePartKey]] partition. Output per
    * occasion: (t, c_t, r_t, m_t, cum_cm, cum_r, nhat_e6). */
  def schnabelTrajectoryE6(df: DataFrame, unit: Column,
      occasion: Column): DataFrame = {
    val caps = df.select(unit.as("u"), occasion.cast("long").as("t"))
      .where(col("u").isNotNull && col("t").isNotNull)
      .distinct()
    val first = caps.groupBy(col("u")).agg(min(col("t")).as("ft"))
    val occ = caps.join(first, "u")
      .groupBy(col("t"))
      .agg(count(lit(1)).as("c_t"),
        sum(when(col("ft") < col("t"), 1L).otherwise(0L)).as("r_t"),
        sum(when(col("ft") === col("t"), 1L).otherwise(0L)).as("new_t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Census.onePartKey(col("t"))).orderBy(col("t"))
    occ
      .withColumn("m_t",
        coalesce(sum(col("new_t")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("cum_cm", sum(col("c_t").cast("decimal(38,0)")
        * col("m_t")).over(w))
      .withColumn("cum_r", sum(col("r_t")).over(w))
      .select(col("t"), col("c_t"), col("r_t"), col("m_t"),
        expr("CAST(cum_cm AS BIGINT)").as("cum_cm"), col("cum_r"),
        expr("""CASE WHEN cum_r = 0 THEN 0
              | ELSE CAST(cum_cm * 1000000 div cum_r AS BIGINT)
              | END""".stripMargin).as("nhat_e6"))
  }
}
