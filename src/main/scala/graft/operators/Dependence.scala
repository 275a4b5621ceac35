package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chatterjee's rank correlation ξ (Chatterjee 2021, JASA, "A new
  * coefficient of correlation") — the modern dependence measure that
  * detects ANY functional relationship, not just monotone ones
  * (Spearman/Kendall read y = x² as ≈ 0; ξ reads it as ≈ 1):
  * order the data by x, take the ranks of y in that order, and
  * measure how much adjacent y-ranks jump,
  *
  *   ξ = 1 − 3·Σᵢ|r_{i+1} − rᵢ| / (n² − 1)
  *
  * Convention (documented): the no-ties formula applied to DOUBLED
  * MIDRANKS of y (so r2 = 2r and the sum doubles out:
  * ξ_e6 = 1e6 − 3·Σ|Δr2|·1e6 div (2·(n²−1))); x-ties are broken by
  * the caller's tie-break column (a unique id — pinned total order).
  *
  * Scale shape: the x-ordering uses [[GlobalRank.withGlobalRowNumber]]
  * (range repartition + per-partition offsets — NO single-reducer
  * window); y-ranks come from the value-census rank2 map
  * (bounded-domain, guarded); the adjacency Σ|Δ| is a pure rn = rn+1
  * equi self-join (the q251 ACF lag trick). One quadratic in
  * DECIMAL(38,0). Output one row: (n, sum_abs_dr2, xi_e6). */
object Dependence {

  def chatterjeeXiE6(df: DataFrame, x: Column, y: Column,
      tieBreak: Column): DataFrame = {
    val base = df.select(x.cast("long").as("__x"),
        y.cast("long").as("__y"), tieBreak.as("__tb"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val yr = RankStats.rank2MapFor(base, col("__y"), "r2")
    val withRank = base.join(yr, col("__y") === col("r2_v"))
      .select(col("__x"), col("__tb"), col("r2"))
    val ranked = GlobalRank.withGlobalRowNumber(withRank,
      Seq(col("__x"), col("__tb")), "rn")
    val adj = ranked.select(col("rn"), col("r2"))
      .join(ranked.select((col("rn") - 1L).as("rn"),
        col("r2").as("r2next")), "rn")
    val stats = adj.agg(
      coalesce(sum(abs(col("r2next") - col("r2"))), lit(0L))
        .as("sum_abs_dr2"))
    val n = ranked.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(stats))
      .select(col("n"), col("sum_abs_dr2"),
        when(col("n") > 1L, expr(
          """1000000 - CAST(3 * CAST(sum_abs_dr2 AS DECIMAL(38,0))
            | * 1000000 div (2 * (CAST(n AS DECIMAL(38,0)) * n - 1))
            | AS BIGINT)""".stripMargin)).as("xi_e6"))
  }
}
