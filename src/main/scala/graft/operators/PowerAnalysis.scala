package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment power planning — "how big must the test be" and "what
  * can the current sample even detect", per metric segment, in exact
  * integer arithmetic.
  *
  * Classical two-arm forms with pinned e3 z-scores (defaults: two-sided
  * α = 5% → z_α = 1.960, power 80% → z_β = 0.842):
  *
  *   n_required = ⌈ 2·(z_α+z_β)²·s² / Δ² ⌉        (per arm)
  *   MDE(n)     = (z_α+z_β) · √(2·s²/n)
  *
  * with s² the exact sample variance (n·Σx² − (Σx)²) div (n·(n−1)) and
  * Δ the caller's target lift, pinned to mean div liftDenom (default
  * 1% of the segment mean). Integer discipline: z's carried at e3
  * (so (z_α+z_β)² is e6), the ceiling is (num + den − 1) div den, the
  * root is the corrected isqrt of (2·s²·1e12) div n — every product
  * widened to DECIMAL(38,0) first. Degenerate segments answer NULL
  * (n < 2 → no variance; Δ = 0 → no target), never a made-up number.
  *
  * Shape: ONE hash aggregate from row grain to segment grain; the
  * planner arithmetic runs on the segment census. */
object PowerAnalysis {

  def mdeSampleSize(df: DataFrame, groupCols: Seq[String], value: Column,
      zAlphaE3: Long = 1960L, zBetaE3: Long = 842L,
      liftDenom: Long = 100L): DataFrame = {
    require(zAlphaE3 > 0 && zBetaE3 >= 0 && liftDenom > 0)
    val zs = zAlphaE3 + zBetaE3
    val base = df.select(groupCols.map(col) :+
        value.cast("long").as("__x"): _*)
      .where(col("__x").isNotNull)
    base.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__s"),
        sum(expr("CAST(__x AS DECIMAL(38,0)) * __x"))
          .cast("decimal(38,0)").as("__ss"))
      .withColumn("mean", expr("CAST(__s div n AS BIGINT)"))
      .withColumn("var_cents2", expr(
        """CASE WHEN n < 2 THEN NULL
          | ELSE CAST((CAST(n AS DECIMAL(38,0)) * __ss
          |    - CAST(__s AS DECIMAL(38,0)) * __s)
          |   div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) END"""
          .stripMargin))
      .withColumn("delta", expr(s"CAST(mean div $liftDenom AS BIGINT)"))
      .withColumn("n_required", expr(
        s"""CASE WHEN var_cents2 IS NULL OR delta = 0 THEN NULL
           | ELSE CAST((CAST(2 AS DECIMAL(38,0)) * ${zs * zs} * var_cents2
           |    + CAST(delta AS DECIMAL(38,0)) * delta * 1000000 - 1)
           |   div (CAST(delta AS DECIMAL(38,0)) * delta * 1000000)
           |  AS BIGINT) END""".stripMargin))
      // the quotient here (~2·s²·1e12/n) can exceed BIGINT, and Spark's
      // `div` yields LONG — floor-divide in DECIMAL instead via
      // (a − a mod n)/n, which is exactly divisible so the decimal
      // division is exact (positive operands → mod == pmod == DuckDB //)
      .withColumn("__a", expr(
        """CASE WHEN var_cents2 IS NULL THEN CAST(0 AS DECIMAL(38,0))
          | ELSE CAST(2 AS DECIMAL(38,0)) * var_cents2 * 1000000000000
          | END""".stripMargin).cast("decimal(38,0)"))
      .withColumn("__r2",
        expr("CAST((__a - pmod(__a, n)) / n AS DECIMAL(38,0))"))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__r2 AS DOUBLE))) AS BIGINT)"))
      .withColumn("__rt", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __r2
          |   THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __r2
          |   THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .withColumn("mde_e6", expr(
        s"""CASE WHEN var_cents2 IS NULL THEN NULL
           | ELSE CAST(CAST($zs AS DECIMAL(38,0)) * __rt div 1000
           |  AS BIGINT) END""".stripMargin))
      .select(groupCols.map(col) ++ Seq(col("n"), col("mean"),
        col("var_cents2"), col("delta"), col("n_required"),
        col("mde_e6")): _*)
  }
}
