package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Fixed- and random-effects meta-analysis across strata
  * (DerSimonian & Laird 1986) — the "combine the per-segment
  * experiment readouts into one effect" step that follows the q376
  * power planner and the q365 stratified test: k strata each
  * contribute a mean-difference effect dᵢ and its variance vᵢ; the
  * fixed-effect model inverse-variance-weights them, Cochran's Q
  * measures heterogeneity, and the DL moment estimator τ² inflates
  * the weights into the random-effects model.
  *
  * Unit convention (pinned, mirrored in the oracle): effects at e6
  * (d_e6), variances of those e6 effects at e12 (v_e12 = Var(d)·1e12),
  * so weights W = 1e24 div v_e12 are exact inverse variances. Weights
  * and weight sums stay DECIMAL(38,0) throughout — a W can reach 1e24,
  * far past LONG, so quotients use the positive floor identity
  * (a − pmod(a,b))/b (≡ HUGEINT `//` on nonnegative operands). Chain:
  *
  *   fixed_e6  = Σ W·d_e6 div ΣW
  *   q_e6      = Σ W·(d_e6 − fixed_e6)² div 1e18        (Q·1e6)
  *   c_w       = ΣW − ΣW² div ΣW
  *   tau2_e12  = max(0, (q_e6 − (k−1)·1e6)·1e18 div c_w)
  *
  * (unit check: W carries 1e12·(1/v_real), so c_w = 1e12·C_real and
  * (q_e6 − df·1e6) = 1e6·(Q − df); τ²·1e12 = 1e12·(Q−df)/C_real =
  * (q_e6 − df·1e6)·1e18 div c_w exactly.)
  *   W*        = 1e24 div (v_e12 + tau2_e12)
  *   random_e6 = Σ W*·d_e6 div ΣW*
  *
  * d may be negative; the two effect quotients divide a signed
  * numerator by a positive ΣW and truncate toward zero in both
  * engines. Strata with v ≤ 0 (degenerate arms) are EXCLUDED and
  * counted (k_dropped) rather than given infinite weight.
  *
  * Input: one row per stratum (the caller's per-segment Welch frame).
  * Scale shape: the stratum frame IS a census; three tiny aggregates
  * with one-row broadcasts between the stages.
  */
object MetaAnalysis {

  private val E24 = "CAST(1 AS DECIMAL(38,0)) * 1000000000000 * 1000000000000"

  /** Positive-operand floor division that stays DECIMAL. */
  private def fdiv(a: String, b: String): String =
    s"CAST((($a) - pmod(($a), ($b))) / ($b) AS DECIMAL(38,0))"

  def derSimonianLairdE6(strata: DataFrame, dE6: Column,
      vE12: Column): DataFrame = {
    val base = strata.select(dE6.cast("long").as("d"),
        vE12.cast("long").as("v"))
      .withColumn("ok", coalesce(col("v") > 0L, lit(false)))
    val good = base.where(col("ok"))
      .withColumn("w", expr(fdiv(E24, "CAST(v AS DECIMAL(38,0))")))
      .truncate(true) // three aggregates read it
    val dropped = base.agg(
      sum(when(!col("ok"), 1L).otherwise(0L)).as("k_dropped"))
    val fix = good.agg(count(lit(1)).as("k"),
        sum(expr("w * d")).as("__swd"),
        sum(col("w")).as("__sw"),
        sum(expr("w * w")).as("__sww"))
      .withColumn("fixed_e6",
        expr("CAST(__swd div __sw AS BIGINT)"))
      .truncate(true)
    val q = good.crossJoin(broadcast(fix.select(col("fixed_e6"))))
      .agg(sum(expr("w * (d - fixed_e6) * (d - fixed_e6)"))
        .as("__qnum"))
      .select(expr(
        "CAST(__qnum div 1000000000000000000 AS BIGINT)").as("q_e6"))
    val withTau = fix.crossJoin(broadcast(q))
      .withColumn("__c",
        expr("__sw - " + fdiv("__sww", "__sw")))
      .withColumn("tau2_e12", greatest(lit(0L), expr(
        """CAST(CAST(q_e6 - (k - 1) * 1000000 AS DECIMAL(38,0))
          | * 1000000000000 * 1000000 div __c AS BIGINT)"""
          .stripMargin)))
      .truncate(true)
    val rand = good.crossJoin(broadcast(withTau.select(col("tau2_e12"))))
      .withColumn("ws",
        expr(fdiv(E24, "CAST(v AS DECIMAL(38,0)) + tau2_e12")))
      .agg(sum(expr("ws * d")).as("__swd2"),
        sum(col("ws")).as("__sw2"))
      .select(expr("CAST(__swd2 div __sw2 AS BIGINT)").as("random_e6"))
    withTau.select(col("k"), col("fixed_e6"), col("q_e6"),
        col("tau2_e12"))
      .crossJoin(broadcast(dropped))
      .crossJoin(broadcast(rand))
      .select(col("k"), col("k_dropped"), col("fixed_e6"), col("q_e6"),
        col("tau2_e12"), col("random_e6"))
  }
}
