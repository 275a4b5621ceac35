package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Little's-law consistency audit (Little 1961): L = λ·W ties
  * time-average concurrency to arrival rate × mean sojourn. The
  * identity is EXACT when L comes from the interval integral
  * (Σ durations div horizon — emitted as l_exact_e6, and λ·W
  * reproduces it by construction), so the AUDIT number is the gap
  * between that exact L and the L a monitoring system actually
  * measures: mean concurrency over a sampled grid of instants.
  * A big residual means the sampling grid aliases the workload
  * (bursts shorter than the grid step) — the practical check before
  * anyone trusts dashboard concurrency.
  *
  *   lambda_per_hour_e6 = n·3_600_000·1e6 div horizon_ms
  *   w_ms               = Σdur div n
  *   l_exact_e6         = Σdur·1e6 div horizon_ms
  *   l_grid_e6          = Σ_g active(g)·1e6 div n_grid
  *       (active at instant g ⟺ s ≤ g AND g < e — pinned half-open)
  *   grid_residual_ppm  = |l_grid − l_exact|·1e6 div l_exact
  *
  * Scale shape: one hash aggregate to (unit, s, e), a broadcast
  * two-row horizon frame, a broadcast GRID join (the grid is
  * time-domain-bounded — hours over the horizon), single-row sums.
  * Output one row: (n_units, horizon_ms, n_grid, lambda_per_hour_e6,
  * w_ms, l_exact_e6, l_grid_e6, grid_residual_ppm). */
object Queueing {

  def littlesLawAudit(df: DataFrame, unit: Column, ts: Column,
      gridStepMs: Long = 3600000L): DataFrame = {
    require(gridStepMs > 0L)
    val spans = df.select(unit.as("u"), ts.cast("long").as("t"))
      .where(col("u").isNotNull && col("t").isNotNull)
      .groupBy(col("u"))
      .agg(min(col("t")).as("s"), max(col("t")).as("e"))
      .withColumn("dur", col("e") - col("s"))
      .truncate(true) // horizon, sums, and grid join read it
    val horizon = spans.agg(min(col("s")).as("h0"), max(col("e")).as("h1"),
        count(lit(1)).as("n"), sum(col("dur")).as("sumdur"))
      .withColumn("hms", col("h1") - col("h0"))
    // Sub-step unaligned horizons make ceil(h0/step) > floor(h1/step);
    // Spark's sequence would then emit a DESCENDING run of bogus instants
    // outside [h0, h1] while SQL generate_series returns empty — guard to
    // an empty grid so both engines agree on degenerate streams.
    val grid = horizon.select(explode(
        expr(s"""CASE WHEN CAST((h0 + ${gridStepMs - 1}) div $gridStepMs AS BIGINT)
                |          <= h1 div $gridStepMs
                |     THEN sequence(
                |       CAST((h0 + ${gridStepMs - 1}) div $gridStepMs AS BIGINT),
                |       h1 div $gridStepMs)
                |     ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
        .as("gidx"))
      .select((col("gidx") * gridStepMs).as("g"))
    val active = spans.join(broadcast(grid),
        col("s") <= col("g") && col("g") < col("e"))
      .agg(count(lit(1)).as("n_active_points"))
    val nGrid = grid.agg(count(lit(1)).as("n_grid"))
    horizon.crossJoin(broadcast(active)).crossJoin(broadcast(nGrid))
      .select(col("n").as("n_units"), col("hms").as("horizon_ms"),
        col("n_grid"),
        when(col("hms") > 0L, expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * 3600000 * 1000000
            |div hms AS BIGINT)""".stripMargin))
          .as("lambda_per_hour_e6"),
        expr("sumdur div n").as("w_ms"),
        when(col("hms") > 0L, expr(
          "CAST(CAST(sumdur AS DECIMAL(38,0)) * 1000000 div hms AS BIGINT)"))
          .as("l_exact_e6"),
        when(col("n_grid") > 0L, expr(
          "n_active_points * 1000000 div n_grid")).as("l_grid_e6"))
      .withColumn("grid_residual_ppm",
        when(col("l_exact_e6") > 0L, expr(
          """CAST(CAST(abs(l_grid_e6 - l_exact_e6) AS DECIMAL(38,0))
            | * 1000000 div l_exact_e6 AS BIGINT)""".stripMargin)))
  }
}
