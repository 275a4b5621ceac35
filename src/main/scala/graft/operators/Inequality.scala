package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Theil-T inequality index with exact between/within decomposition
  * (Theil 1967; Shorrocks 1980 on decomposability) — the inequality
  * measure that, unlike Gini (q163), splits ADDITIVELY across groups:
  *
  *   T = Σ_g s_g·T_g  +  Σ_g s_g·ln( (X_g/X) / (N_g/N) )
  *       └─ within ─┘    └────────── between ──────────┘
  *
  * with s_g = X_g/X the group's value share — the "how much revenue
  * inequality is ACROSS nations vs WITHIN them" readout.
  *
  * Exactness discipline (the q100/bigram-LM rule for ln): every term
  * is ONE pinned double pipeline mirrored character-for-character in
  * the oracle — integer sufficient statistics in, the identical
  * multiply/divide/ln sequence, one `round` to e6 — then LONG sums of
  * the rounded terms (associative, partition-order independent):
  *
  *   within term (unit i in g): round( x_i·1e6/X_g · ln(x_i·N_g/X_g) )
  *   between term (group g):    round( X_g·1e6/X · ln(X_g·N/(X·N_g)) )
  *
  * Units with x ≤ 0 are excluded (ln is undefined; standard for
  * Theil). Doubles are IEEE-identical across engines given identical
  * inputs and operation order, which the mirrored SQL guarantees.
  *
  * Output: one row per group — n, sum_v, share_e6, theil_within_e6
  * (T_g, the group's own index), between_term_e6. The caller folds
  * Σ s_g·T_g + Σ between for the scalar T; the spec pins the
  * decomposition against the directly-computed global index.
  *
  * Scale shape: one hash aggregate to (group) sufficient statistics,
  * one broadcast of the global one-row frame, one broadcast join of
  * group stats back onto units for the within terms, one final group
  * aggregate. No windows, no data-sized frame past the unit pass.
  */
object Inequality {

  /** `df` at unit grain: `group` and a positive integer `value`. */
  def theilDecompositionE6(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    val units = df.select(group.as("g"), value.cast("long").as("x"))
      .where(col("x") > 0L)
    val gStats = units.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"))
    val tot = gStats.agg(sum(col("ng")).as("n"), sum(col("xg")).as("x"))
    val within = units.join(broadcast(gStats), Seq("g"))
      .select(col("g"), expr(
        """CAST(round(CAST(x AS DOUBLE) * 1000000.0 / xg
          | * ln(CAST(x AS DOUBLE) * ng / xg)) AS BIGINT)"""
          .stripMargin).as("t_e6"))
      .groupBy(col("g")).agg(sum(col("t_e6")).as("theil_within_e6"))
    gStats.join(within, Seq("g"))
      .crossJoin(broadcast(tot))
      .select(col("g"), col("ng").as("n"), col("xg").as("sum_v"),
        expr("CAST(CAST(xg AS DECIMAL(38,0)) * 1000000 div x AS BIGINT)")
          .as("share_e6"),
        col("theil_within_e6"),
        expr("""CAST(round(CAST(xg AS DOUBLE) * 1000000.0 / x
              | * ln(CAST(xg AS DOUBLE) * n / (CAST(x AS DOUBLE) * ng)))
              | AS BIGINT)""".stripMargin).as("between_term_e6"))
  }

  /** Hill estimator of the power-law tail index (Hill 1975) over the
    * top-k order statistics — the tail-side companion to the
    * rank–frequency HEAD slope (q379 Zipf fit): how heavy is the
    * extreme tail of revenue / degree / token-frequency,
    *
    *   H·1e6 = (Σ_{i≤k} round(ln(x_(i)/x_(k+1))·1e6)) div k
    *   α·1e6 = 1e12 div H_e6            (the tail exponent, 1/H)
    *
    * ln terms follow the pinned-double q100 rule (one double division,
    * one ln, one round — every term ≥ 0 since x_(i) ≥ x_(k+1));
    * the top-(k+1) set is selected by the UNIQUE order
    * (value DESC, tieBreak ASC), so boundary ties are deterministic —
    * tied rows contribute ln(1) = 0 regardless of which side of the
    * cut they land on.
    *
    * Scale shape: one TakeOrderedAndProject (distributed top-k, never
    * a global sort), a broadcast one-row threshold, a k-row sum. */
  def hillTailE6(df: DataFrame, value: Column, tieBreak: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000000,
      s"Inequality.hillTailE6: need 1 ≤ k ≤ 1e6, got $k")
    val top = df.select(value.cast("long").as("x"), tieBreak.as("tb"))
      .where(col("x") > 0L)
      .orderBy(col("x").desc, col("tb"))
      .limit(k + 1)
    val thresh = top.agg(min(col("x")).as("xk1"))
    top.crossJoin(broadcast(thresh))
      .select(col("xk1"), expr(
        """CAST(round(ln(CAST(x AS DOUBLE) / xk1) * 1000000.0)
          |AS BIGINT)""".stripMargin).as("t"))
      .groupBy(col("xk1"))
      .agg(sum(col("t")).as("__num"), count(lit(1)).as("__sel"))
      .select(lit(k.toLong).as("k"), col("xk1"),
        expr(s"__num div ${k}L").as("hill_e6"))
      .withColumn("alpha_e6",
        when(col("hill_e6") > 0L,
          expr("1000000000000 div hill_e6")))
  }
}
