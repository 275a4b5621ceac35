package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash64

/** Horvitz–Thompson estimation under Poisson-PPS sampling (Horvitz &
  * Thompson 1952; Särndal/Swensson/Wretman design-based theory): each
  * unit enters the sample independently with inclusion probability
  * π_i = min(1, m·s_i/S) (size-proportional, expected size m), and the
  * design-unbiased total estimator is Σ_sample y_i/π_i with the Poisson
  * variance estimate Σ_sample (1−π_i)/π_i². The audit row carries the
  * TRUE totals beside the estimates — the "would this sampling design
  * have been good enough" readout run before shipping a cheap sampled
  * dashboard.
  *
  * Determinism: inclusion draws are 53-bit PolyHash64 uniforms per
  * (unit, salt) — never rand() — compared in exact integers:
  *   include ⟺ u53·S < m·s_i·2⁵³   (DECIMAL(38,0) both sides),
  * which also absorbs the π ≥ 1 certainty stratum (u53 < 2⁵³ always).
  * Per-unit weight/variance terms are truncating integer chains
  * (w_e6 = S·1e6 div (m·s_i); var term = (S−m·s_i)·S·1e6 div (m·s_i)²),
  * summed in DECIMAL(38,0) — the whole row hash-gates cross-engine.
  *
  * Shape: one scan computes sizes; S rides a broadcast one-row frame;
  * the sample filter, weights and sums are scalar projections + one
  * final aggregate. Nothing sorts; nothing is collected. */
object HorvitzThompson {

  def poissonPpsAudit(df: DataFrame, unit: Column, size: Column,
      y: Column, expectedSample: Long, salt: String): DataFrame = {
    require(expectedSample >= 1L,
      s"poissonPpsAudit: expectedSample = $expectedSample")
    PolyHash64.register(df.sparkSession)
    val base = df.select(unit.cast("string").as("u"),
        size.cast("long").as("s"), y.cast("long").as("y"))
      .where(col("u").isNotNull && col("s").isNotNull && col("s") > 0L &&
        col("y").isNotNull)
    val tot = broadcast(base.agg(
      coalesce(sum(col("s").cast("decimal(38,0)")), expr(
        "CAST(0 AS DECIMAL(38,0))")).as("big_s"),
      count(lit(1)).as("n_pop"),
      coalesce(sum(col("y").cast("decimal(38,0)")), expr(
        "CAST(0 AS DECIMAL(38,0))")).as("true_total")))
    val m = expectedSample
    val drawn = base.crossJoin(tot)
      .withColumn("__u53", shiftrightunsigned(
        PolyHash64.polyHash64(concat(col("u"), lit(s"#$salt"))), 11))
      .where(expr(
        s"CAST(__u53 AS DECIMAL(38,0)) * big_s" +
          s" < CAST($m AS DECIMAL(38,0)) * s * 9007199254740992"))
      .withColumn("__pin", expr(s"CAST($m AS DECIMAL(38,0)) * s"))
      .withColumn("w_e6", expr(
        """CASE WHEN __pin >= big_s THEN 1000000
          | ELSE CAST(big_s * 1000000 div __pin AS BIGINT) END"""
          .stripMargin))
      .withColumn("yht", expr(
        """CASE WHEN __pin >= big_s THEN y
          | ELSE CAST(CAST(y AS DECIMAL(38,0)) * big_s div __pin
          |   AS BIGINT) END""".stripMargin))
      .withColumn("vterm_e6", expr(
        """CASE WHEN __pin >= big_s THEN 0
          | ELSE CAST((big_s - __pin) * big_s * 1000000
          |   div (__pin * __pin) AS BIGINT) END""".stripMargin))
    drawn.groupBy(col("n_pop"), col("true_total"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("w_e6").cast("decimal(38,0)")).as("__nhat"),
        sum(col("yht").cast("decimal(38,0)")).as("__that"),
        sum(col("vterm_e6").cast("decimal(38,0)")).as("__vhat"))
      .select(col("n_pop"),
        expr("CAST(true_total AS BIGINT)").as("true_total"),
        col("n_sampled"),
        expr("CAST(__nhat AS BIGINT)").as("n_hat_e6"),
        expr("CAST(__that AS BIGINT)").as("total_hat"),
        expr("CAST(__vhat AS BIGINT)").as("var_nhat_e6"),
        expr("""CASE WHEN true_total = 0 THEN 0
               | ELSE CAST(abs(__that - true_total) * 1000000
               |   div true_total AS BIGINT) END""".stripMargin)
          .as("total_err_ppm"))
  }
}
