package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Empirical-Bayes beta–binomial rate smoothing (Robbins 1956 for the
  * EB idea; the beta–binomial method-of-moments is the production CTR/
  * return-rate recipe): items with few trials get pulled toward the
  * population prior, killing the "3 clicks / 3 views = 100% CTR"
  * pathology before ranking or thresholding sees it.
  *
  * Method-of-moments prior from the per-item raw rates rᵢ = xᵢ/nᵢ
  * (e6, truncating):
  *
  *   m_e6     = Σr div k
  *   var_e12  = (k·Σr² − (Σr)²) div (k·(k−1))
  *   ab_e6    = m·(1e6−m)·1e6 div var − 1e6      (α+β; NULL when the
  *              observed variance exceeds the binomial maximum — the
  *              beta prior doesn't exist, any fit would lie)
  *   alpha_e6 = m·ab div 1e6
  *   smoothed = (x·1e6 + alpha_e6)·1e6 div (n·1e6 + ab_e6)
  *
  * — the classical (x+α)/(n+α+β) cleared to one truncating DECIMAL
  * division per item. Equal-weight moments over items (the textbook
  * MoM — NOT trial-weighted; documented choice).
  *
  * Scale shape: items arrive pre-aggregated (the caller's one raw
  * pass); here one k-row census aggregate, a broadcast prior, a
  * map-side smoothing pass, and a TakeOrderedAndProject top-k by
  * (trials DESC, item) for the emitted table. Output: (item, x, n,
  * raw_e6, smoothed_e6, alpha_e6, ab_e6). */
object EmpiricalBayes {

  def betaBinomialSmooth(df: DataFrame, item: Column, successes: Column,
      trials: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"EmpiricalBayes: topK must be ≥ 1, got $topK")
    val base = df.select(item.as("item"),
        successes.cast("long").as("x"), trials.cast("long").as("n"))
      .where(col("n") > 0L && col("x") >= 0L && col("x") <= col("n"))
      .withColumn("raw_e6", expr("x * 1000000 div n"))
      .truncate(true) // prior census + smoothing pass read it
    val prior = base
      .agg(count(lit(1)).as("k"), sum(col("raw_e6")).as("sr"),
        sum(expr("CAST(raw_e6 AS DECIMAL(38,0)) * raw_e6")).as("qr"))
      .withColumn("m_e6", expr("sr div k"))
      .withColumn("var_e12", when(col("k") > 1L, expr(
        """CAST((k * qr - CAST(sr AS DECIMAL(38,0)) * sr)
          |div (CAST(k AS DECIMAL(38,0)) * (k - 1)) AS BIGINT)"""
          .stripMargin)))
      .withColumn("ab_e6", when(col("var_e12") > 0L, expr(
        """CAST(CAST(m_e6 AS DECIMAL(38,0)) * (1000000 - m_e6)
          | * 1000000 div var_e12 - 1000000 AS BIGINT)""".stripMargin)))
      .withColumn("ab_e6",
        when(col("ab_e6") > 0L, col("ab_e6")))
      .withColumn("alpha_e6", expr(
        "CAST(CAST(m_e6 AS DECIMAL(38,0)) * ab_e6 div 1000000 AS BIGINT)"))
      .select(col("m_e6"), col("var_e12"), col("ab_e6"),
        col("alpha_e6"))
    base.crossJoin(broadcast(prior))
      .withColumn("smoothed_e6", when(col("ab_e6").isNotNull, expr(
        """CAST((x * 1000000 + alpha_e6) * CAST(1000000 AS DECIMAL(38,0))
          |div (n * 1000000 + ab_e6) AS BIGINT)""".stripMargin)))
      .orderBy(col("n").desc, col("item"))
      .limit(topK)
      .select(col("item"), col("x"), col("n"), col("raw_e6"),
        col("smoothed_e6"), col("alpha_e6"), col("ab_e6"))
  }
}
