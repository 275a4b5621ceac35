package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample L-moments (Hosking 1990) — the order-statistics moment
  * family: λ₁ (location), λ₂ (L-scale), and the ratios τ = λ₂/λ₁
  * (L-CV), τ₃ = λ₃/λ₂ (L-skewness), τ₄ = λ₄/λ₂ (L-kurtosis).
  * Linear in the data → far more outlier-robust than classical
  * moment skew/kurtosis, and the hydrology/extreme-value standard
  * for distribution identification.
  *
  * The sorted-data formulas collapse onto the VALUE CENSUS without
  * ranking rows: a value v occupying sorted positions (cum−c, cum]
  * contributes closed-form position-polynomial span sums (j = i−1):
  *
  *   A₀ = Σ v·c
  *   A₁ = Σ x·(i−1)           : span Σj            = c·(2cum−c−1)/2
  *   A₂ = Σ x·(i−1)(i−2)      : span Σj(j−1)       = G(cum−1) −
  *        G(cum−c−1),  G(m) = (m+1)·m·(m−1)/3
  *   A₃ = Σ x·(i−1)(i−2)(i−3) : span Σj(j−1)(j−2)  = H(cum−1) −
  *        H(cum−c−1),  H(m) = (m+1)·m·(m−1)·(m−2)/4
  *
  * (every divisor divides exactly — consecutive-integer products; all
  * pre-division operands are ≥ 0). Ratios clear their factorial
  * denominators:
  *
  *   λ2num = 2A₁ − A₀(n−1)                       [= λ₂·n(n−1)]
  *   λ3num = 6A₂ − 6A₁(n−2) + A₀(n−1)(n−2)      [= λ₃·n(n−1)(n−2)]
  *   λ4num = 20A₃ − 30A₂(n−3) + 12A₁(n−2)(n−3)
  *           − A₀(n−1)(n−2)(n−3)                 [= λ₄·n…(n−3)]
  *   lambda1_e6 = A₀·1e6 div n
  *   lambda2_e6 = λ2num·1e6 div (n·(n−1))
  *   t_e6  = λ2num·1e6 div (A₀·(n−1))
  *   t3_e6 = λ3num·1e6 div (λ2num·(n−2))
  *   t4_e6 = λ4num·1e6 div (λ2num·(n−2)·(n−3))
  *
  * all DECIMAL(38,0), truncating toward zero (τ₃/τ₄ are signed; the
  * λ2num denominator is ≥ 0). NULL ratios when a denominator is ≤ 0.
  * Positive values are the caller's contract for τ to read as L-CV.
  *
  * Scale shape: ONE hash aggregate to the bounded-domain value census
  * (the caller buckets), one guarded ascending cumulative window, one
  * single-row reduction. Output one row:
  * (n, lambda1_e6, lambda2_e6, t_e6, t3_e6, t4_e6). */
object LMoments {

  def lMomentsE6(df: DataFrame, value: Column): DataFrame = {
    val census = df.select(value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wLe = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = census
      .withColumn("cum", Census.guardLong(sum(col("c")).over(wLe),
        count(lit(1)).over(whole), "LMoments.lMomentsE6"))
    def g(m: String) =
      s"(CAST(($m) + 1 AS DECIMAL(38,0)) * ($m) * (($m) - 1)) / 3"
    def h(m: String) =
      s"""(CAST(($m) + 1 AS DECIMAL(38,0)) * ($m) * (($m) - 1)
         | * (($m) - 2)) / 4""".stripMargin
    val agg = cum.agg(
      sum(col("c")).as("n"),
      sum(expr("CAST(v AS DECIMAL(38,0)) * c")).as("a0"),
      sum(expr(
        """CAST(CAST(v AS DECIMAL(38,0))
          | * (CAST(c AS DECIMAL(38,0)) * (2 * cum - c - 1) / 2)
          | AS DECIMAL(38,0))""".stripMargin)).as("a1"),
      sum(expr(s"""CAST(CAST(v AS DECIMAL(38,0))
                  | * (${g("cum - 1")} - ${g("cum - c - 1")})
                  | AS DECIMAL(38,0))""".stripMargin)).as("a2"),
      sum(expr(s"""CAST(CAST(v AS DECIMAL(38,0))
                  | * (${h("cum - 1")} - ${h("cum - c - 1")})
                  | AS DECIMAL(38,0))""".stripMargin)).as("a3"))
    agg
      .withColumn("__l2n", expr("2 * a1 - a0 * (n - 1)"))
      .withColumn("__l3n", expr(
        "6 * a2 - 6 * a1 * (n - 2) + a0 * (n - 1) * (n - 2)"))
      .withColumn("__l4n", expr(
        """20 * a3 - 30 * a2 * (n - 3) + 12 * a1 * (n - 2) * (n - 3)
          | - a0 * (n - 1) * (n - 2) * (n - 3)""".stripMargin))
      .select(col("n"),
        when(col("n") > 0L,
          expr("CAST(a0 * 1000000 div n AS BIGINT)")).as("lambda1_e6"),
        when(col("n") > 1L, expr(
          """CAST(__l2n * 1000000
            |div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)"""
            .stripMargin)).as("lambda2_e6"),
        when(col("n") > 1L && col("a0") > 0L,
          expr("CAST(__l2n * 1000000 div (a0 * (n - 1)) AS BIGINT)"))
          .as("t_e6"),
        when(col("n") > 2L && col("__l2n") > 0L, expr(
          "CAST(__l3n * 1000000 div (__l2n * (n - 2)) AS BIGINT)"))
          .as("t3_e6"),
        when(col("n") > 3L && col("__l2n") > 0L, expr(
          """CAST(__l4n * 1000000 div (__l2n * (n - 2) * (n - 3))
            |AS BIGINT)""".stripMargin)).as("t4_e6"))
  }
}
