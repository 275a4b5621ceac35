package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Causal readouts over observational slices — the analytics layer a
  * metrics pipeline runs AFTER the counting: "did the rollout move the
  * metric, net of the trend everyone experienced?"
  */
object Causal {

  /** Difference-in-differences (Card & Krueger 1994 canonical form): the
    * treated group's pre→post change minus the control group's,
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    *
    * under the parallel-trends assumption. Each cell mean truncates to
    * e6 BEFORE the differences (the pinned deterministic order — four
    * truncations, then pure LONG subtraction), and the four cell
    * (n, sum) sufficient statistics ride along so a consumer can redo
    * the arithmetic at any precision.
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus —
    * eight conditional sums — collapsing any input size to a single row.
    * Empty cells yield NULL means and a NULL DiD (no silent zero). */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
      outcome: Column): DataFrame = {
    val y = outcome.cast("long")
    def cell(t: Boolean, p: Boolean, what: Column): Column =
      sum(when(treated === t && post === p, what).otherwise(0L))
    def n(t: Boolean, p: Boolean): Column = cell(t, p, lit(1L))
    def s(t: Boolean, p: Boolean): Column = cell(t, p, y)
    val agg = df.agg(
      n(true, false).as("n_t_pre"), s(true, false).as("sum_t_pre"),
      n(true, true).as("n_t_post"), s(true, true).as("sum_t_post"),
      n(false, false).as("n_c_pre"), s(false, false).as("sum_c_pre"),
      n(false, true).as("n_c_post"), s(false, true).as("sum_c_post"))
    def mean(sc: String, nc: String): Column =
      when(col(nc) > 0, expr(s"$sc * 1000000 div $nc"))
    agg
      .withColumn("m_t_pre_e6", mean("sum_t_pre", "n_t_pre"))
      .withColumn("m_t_post_e6", mean("sum_t_post", "n_t_post"))
      .withColumn("m_c_pre_e6", mean("sum_c_pre", "n_c_pre"))
      .withColumn("m_c_post_e6", mean("sum_c_post", "n_c_post"))
      .withColumn("did_e6",
        (col("m_t_post_e6") - col("m_t_pre_e6")) -
          (col("m_c_post_e6") - col("m_c_pre_e6")))
  }

  /** Uplift decile curve (the Qini/uplift evaluation table — Radcliffe
    * 2007): units ranked by a targeting score and cut into n_tiles
    * equal tiles; each tile row carries cumulative treated/control
    * conversion rates and their difference — "if we target the top k
    * tiles, how much incremental conversion do we buy". The standard
    * readout for uplift models and campaign targeting.
    *
    * Determinism: tiles reproduce ntile() over (score DESC, unit id) —
    * a total order — EXACTLY (earlier-tiles-get-the-remainder: with
    * n = q·t + r the first r tiles hold q+1 units), but WITHOUT the
    * single-reducer window ntile plans to: unit ranks come from
    * [[GlobalRank.withGlobalRowNumberAndTotal]] (range-repartitioned,
    * no one-partition sort of the unit frame) and the tile is the
    * closed form of ntile's two regimes over (rank, n, t). Rates
    * truncate to e6 from cumulative LONG counts.
    *
    * Scale shape: one aggregate to unit grain, one RANGE exchange for
    * the ranked tiles (the inherent cost of exact global deciles —
    * swap in the MRL sketch cuts when approximate tiles suffice; no
    * partition ever holds more than its range slice), then a tiny
    * per-tile census whose cumulations run as a broadcast triangular
    * self-join over ≤ nTiles rows — no unpartitioned window anywhere
    * in the plan. */
  def upliftCurve(df: DataFrame, unitCol: String, scoreAgg: Column,
      treated: Column, converted: Column, nTiles: Int): DataFrame = {
    require(nTiles >= 2 && nTiles <= 4096,
      s"nTiles=$nTiles out of [2, 4096] (the cumulative census is " +
        "materialized tile×tile)")
    // scoreAgg is an AGGREGATE expression evaluated at unit grain (e.g.
    // sum(cents)); treated/converted are row predicates max-folded
    val units = df.groupBy(col(unitCol))
      .agg(scoreAgg.as("score"),
        max(treated.cast("long")).as("tr"),
        max(converted.cast("long")).as("cv"))
    val (ranked, n) = GlobalRank.withGlobalRowNumberAndTotal(
      units, Seq(col("score").desc, col(unitCol)), "__rn")
    // ntile's exact closed form: q = n div t, r = n mod t; the first
    // r tiles take q+1 rows (ranks 1..r(q+1)), the rest take q. With
    // n < t (q = 0) every row is its own tile 1..n — ntile's rule too.
    val q = if (nTiles > 0) n / nTiles else 0L
    val r = n % nTiles
    val cut = r * (q + 1L)
    val tileExpr =
      if (q == 0L) col("__rn")
      else expr(s"CASE WHEN __rn <= $cut THEN (__rn - 1) div ${q + 1L} + 1" +
        s" ELSE $r + (__rn - 1 - $cut) div $q + 1 END")
    val tiled = ranked.withColumn("tile", tileExpr.cast("int")).drop("__rn")
    val perTile = tiled.groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        sum(col("tr")).as("n_t"),
        sum(col("tr") * col("cv")).as("conv_t"),
        sum((lit(1L) - col("tr"))).as("n_c"),
        sum((lit(1L) - col("tr")) * col("cv")).as("conv_c"))
      .truncate(true) // ≤ nTiles rows; feeds both join sides once
    val prior = perTile.select(col("tile").as("__t2"),
      col("n_t").as("__nt"), col("conv_t").as("__ct"),
      col("n_c").as("__nc"), col("conv_c").as("__cc"))
    perTile.join(broadcast(prior), col("__t2") <= col("tile"))
      .groupBy(col("tile"), col("n"), col("n_t"), col("conv_t"),
        col("n_c"), col("conv_c"))
      .agg(sum(col("__nt")).as("cum_n_t"),
        sum(col("__ct")).as("cum_conv_t"),
        sum(col("__nc")).as("cum_n_c"),
        sum(col("__cc")).as("cum_conv_c"))
      .withColumn("rate_t_e6",
        when(col("cum_n_t") > 0, expr("cum_conv_t * 1000000 div cum_n_t")))
      .withColumn("rate_c_e6",
        when(col("cum_n_c") > 0, expr("cum_conv_c * 1000000 div cum_n_c")))
      .withColumn("uplift_e6", col("rate_t_e6") - col("rate_c_e6"))
  }

  /** CUPED variance-reduced lift (Deng, Xu, Kohavi & Walker, WSDM 2013,
    * "Improving the Sensitivity of Online Controlled Experiments") —
    * the industry-standard A/B readout: adjust each unit's outcome by
    * its PRE-period covariate, ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x)
    * pooled, shrinking variance by the squared correlation without
    * biasing the lift. Everything emits as exact integer ratios over
    * common denominators (never a float division):
    *   raw lift   = raw_num/raw_den,      raw_den  = n_t·n_c
    *   θ          = theta_num/theta_den   (pooled cov/var quadratics)
    *   CUPED lift = cuped_num/cuped_den,  cuped_den = raw_den·theta_den
    * theta_den = 0 flags a degenerate covariate (all x equal); the
    * sufficient statistics ride along for any-precision consumers.
    *
    * Scale shape: one shuffle to unit grain (conditional pre/post sums
    * with map-side combine), then ONE single-row reduction carrying the
    * pooled quadratics in DECIMAL(38,0). Output: one row. */
  def cupedAdjustedLift(df: DataFrame, unitCol: Column, treated: Column,
      pre: Column, outcome: Column): DataFrame = {
    val y = outcome.cast("long")
    val units = df.groupBy(unitCol.as("__u"))
      .agg(max(when(treated, 1L).otherwise(0L)).as("__t"),
        sum(when(pre, y).otherwise(0L)).as("__x"),
        sum(when(!pre, y).otherwise(0L)).as("__y"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    units
      .agg(count(lit(1)).as("n"),
        sum(when(col("__t") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t") === 1L, col("__x")).otherwise(0L)).as("sx_t"),
        sum(when(col("__t") =!= 1L, col("__x")).otherwise(0L)).as("sx_c"),
        sum(when(col("__t") === 1L, col("__y")).otherwise(0L)).as("sy_t"),
        sum(when(col("__t") =!= 1L, col("__y")).otherwise(0L)).as("sy_c"),
        sum(d(col("__x"))).as("sx"), sum(d(col("__y"))).as("sy"),
        sum(d(col("__x")) * d(col("__x"))).as("sxx"),
        sum(d(col("__x")) * d(col("__y"))).as("sxy"))
      .withColumn("n_c", col("n") - col("n_t"))
      .withColumn("raw_num",
        d(col("sy_t")) * d(col("n_c")) - d(col("sy_c")) * d(col("n_t")))
      .withColumn("raw_den", d(col("n_t")) * d(col("n_c")))
      .withColumn("xdiff_num",
        d(col("sx_t")) * d(col("n_c")) - d(col("sx_c")) * d(col("n_t")))
      .withColumn("theta_num",
        d(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("theta_den",
        d(col("n")) * col("sxx") - col("sx") * col("sx"))
      .select(col("n_t"), col("n_c"), col("raw_num"), col("raw_den"),
        col("theta_num"), col("theta_den"),
        (col("raw_num") * col("theta_den")
          - col("theta_num") * col("xdiff_num")).as("cuped_num"),
        (col("raw_den") * col("theta_den")).as("cuped_den"))
  }

  /** Post-stratified ATE (the classic observational adjustment;
    * Cochran 1968's subclassification, the estimator behind "stratify
    * on a pre-treatment covariate, difference within, reweight by
    * stratum size"): strata are the BIT LENGTH of each unit's
    * pre-period outcome — a log₂-spaced scale bucket that is exact
    * integer arithmetic in any engine (`length(bin(x))`), needs no
    * quantile pass, and puts the heavy-spender / light-spender
    * confound into separate cells.
    *
    * Within each stratum with BOTH arms present:
    *   diff_e6 = trunc((sy_t·n_c − sy_c·n_t)·10⁶ / (n_t·n_c))
    * (DECIMAL(38,0) cross-multiplication, truncation toward zero —
    * DuckDB `//` parity); single-arm strata emit NULL diff and are
    * excluded from the rollup. The stratum = −1 row is the
    * post-stratified estimate: Σ n_s·diff_e6 div Σ n_s over eligible
    * strata (two-stage truncation, pinned).
    *
    * Scale shape: one shuffle to unit grain, one to the ≤64 strata,
    * then a single-row rollup — stratum count is bounded by the bit
    * width, so nothing here grows with the data. */
  def postStratifiedAte(df: DataFrame, unitCol: Column, treated: Column,
      pre: Column, outcome: Column): DataFrame = {
    val y = outcome.cast("long")
    val units = df.groupBy(unitCol.as("__u"))
      .agg(max(when(treated, 1L).otherwise(0L)).as("__t"),
        sum(when(pre, y).otherwise(0L)).as("__x"),
        sum(when(!pre, y).otherwise(0L)).as("__y"))
      .withColumn("stratum", length(bin(col("__x"))).cast("long"))
    val strata = units.groupBy("stratum")
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("__t") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("__t") =!= 1L, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t") === 1L, col("__y")).otherwise(0L)).as("__sy_t"),
        sum(when(col("__t") =!= 1L, col("__y")).otherwise(0L)).as("__sy_c"))
      .withColumn("diff_e6", when(col("n_t") > 0 && col("n_c") > 0,
        expr("""CAST((CAST(__sy_t AS DECIMAL(38,0)) * n_c
                 - CAST(__sy_c AS DECIMAL(38,0)) * n_t) * 1000000
                div CAST(n_t * n_c AS DECIMAL(38,0)) AS BIGINT)""")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perStratum = strata
      .select(col("stratum"), col("n_units"), col("n_t"), col("n_c"),
        col("diff_e6"))
    val overall = strata.where(col("diff_e6").isNotNull)
      .agg(sum(col("n_units")).as("n_units"),
        sum(col("n_t")).as("n_t"), sum(col("n_c")).as("n_c"),
        expr("""CAST(sum(CAST(n_units AS DECIMAL(38,0)) * diff_e6)
                div CAST(sum(n_units) AS DECIMAL(38,0)) AS BIGINT)""")
          .as("diff_e6"))
      .withColumn("stratum", lit(-1L))
      .where(col("n_units").isNotNull)
      .select(col("stratum"), col("n_units"), col("n_t"), col("n_c"),
        col("diff_e6"))
    perStratum.unionByName(overall).truncate(true)
      .transform { out => strata.unpersist(); out }
  }
}
