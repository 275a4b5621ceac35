package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-dispersion audit over bucketed event streams: the Fano factor
  * (variance-to-mean ratio; Fano 1947) and a negative-binomial
  * method-of-moments fit — the standard "is this stream Poisson, or
  * bursty" screen a pipeline runs before alerting thresholds or
  * rate-based sampling are tuned (Poisson ⇒ Fano = 1; overdispersion
  * ⇒ Fano > 1 and the NB (r, p) describes the burst structure).
  *
  * Input: one row per (group, bucket) with the bucket's event count —
  * the caller gap-fills missing buckets with 0 (zeros carry signal;
  * the q162 gap-fill operator is the natural producer). Per group with
  * n buckets, S = Σc, Q = Σc²:
  *
  *   mean_e6 = S·1e6 div n
  *   fano_e6 = (n·Q − S²)·1e6 div (n·S)            (var/mean, exact)
  *   nb_r_e6 = S²·1e6 div (n·Q − S² − n·S)          when var > mean
  *   nb_p_e6 = n·S·1e6 div (n·Q − S²)               (p = mean/var)
  *
  * — the textbook MoM identities cleared of the n² denominators so
  * every quantity is a ratio of exact DECIMAL(38,0) integers with ONE
  * truncating division each. NULL fano/p when S = 0 or var = 0; NULL
  * (r, p) when var ≤ mean (under-dispersed: NB undefined — any
  * imputation would lie).
  *
  * Scale shape: ONE hash aggregate from bucket grain to group grain;
  * everything after is scalar arithmetic on the group census. Bucket
  * counts are the caller's aggregate of raw events, so the raw pass is
  * also a single map-side-combined aggregate.
  */
object Dispersion {

  def fanoNbE6(df: DataFrame, groupCols: Seq[String],
      count: Column): DataFrame = {
    val base = df.select(
      groupCols.map(col) :+ count.cast("long").as("c"): _*)
    base.groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
      .withColumn("__vnum", expr(
        "n * q - CAST(s AS DECIMAL(38,0)) * s"))
      .select(
        groupCols.map(col) :+ col("n") :+ col("s") :+
          expr("CAST(s AS DECIMAL(38,0)) * 1000000 div n")
            .as("mean_e6") :+
          when(col("s") > 0L, expr(
            "CAST(__vnum * 1000000 div (n * CAST(s AS DECIMAL(38,0))) AS BIGINT)"))
            .as("fano_e6") :+
          when(expr("__vnum > n * CAST(s AS DECIMAL(38,0))"), expr(
            """CAST(CAST(s AS DECIMAL(38,0)) * s * 1000000
              |div (__vnum - n * CAST(s AS DECIMAL(38,0))) AS BIGINT)"""
              .stripMargin)).as("nb_r_e6") :+
          when(col("__vnum") > 0L, expr(
            """CAST(n * CAST(s AS DECIMAL(38,0)) * 1000000
              |div __vnum AS BIGINT)""".stripMargin)).as("nb_p_e6"): _*)
  }

  /** Taylor's power law of fluctuation scaling (Taylor 1961, Nature):
    * across comparable groups, variance ≈ a·meanᵇ — the exponent b
    * (1 = Poisson, 2 = clumped/multiplicative) is the ECOLOGY-classic
    * aggregation readout, fit here as the OLS slope of ln(var) on
    * ln(mean) over the group census. Completes the power-law family
    * (q379 Zipf head, q392 Hill tail, q237 Heaps) and gives
    * [[fanoNbE6]]'s per-group dispersion its cross-group scaling law.
    *
    * Exactness: per group the cleared integer moments
    * m_e3 = S·1000 div n and v_e6 = (n·Q − S²)·1e6 div n² (population
    * variance, pinned); groups with v ≤ 0 or n < 2 are excluded and
    * counted. ln points follow the q100 pinned-double rule at e3; the
    * slope is exact integer OLS (DECIMAL quadratics), emitted as the
    * rational plus taylor_b_e6 (toward zero).
    *
    * Scale shape: one pass to group moments, one k-row census
    * aggregate. Output one row: (n_groups, n_dropped, slope_num,
    * slope_den — DECIMAL, taylor_b_e6). */
  def taylorsLawE6(df: DataFrame, groupCol: Column,
      value: Column): DataFrame = {
    val g = df.select(groupCol.as("g"), value.cast("long").as("x"))
      .where(col("g").isNotNull && col("x").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("q"))
      .withColumn("m_e3", expr(
        "CAST(CAST(s AS DECIMAL(38,0)) * 1000 div n AS BIGINT)"))
      .withColumn("v_e6", expr(
        """CAST((n * q - CAST(s AS DECIMAL(38,0)) * s) * 1000000
          |div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
          .stripMargin))
      .localCheckpoint(true) // point census + dropped count read it
    val pts = g.where(col("n") > 1L && col("v_e6") > 0L &&
        col("m_e3") > 0L)
      .select(
        expr("CAST(round(ln(CAST(m_e3 AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("lx"),
        expr("CAST(round(ln(CAST(v_e6 AS DOUBLE)) * 1000.0) AS BIGINT)")
          .as("ly"))
    val dropped = g.agg(sum(when(col("n") <= 1L ||
      col("v_e6") <= 0L || col("m_e3") <= 0L, 1L).otherwise(0L))
      .as("n_dropped"))
    pts.agg(count(lit(1)).as("n_groups"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(expr("CAST(lx AS DECIMAL(38,0)) * ly")).as("sxy"),
        sum(expr("CAST(lx AS DECIMAL(38,0)) * lx")).as("sxx"))
      .crossJoin(broadcast(dropped))
      .withColumn("slope_num",
        expr("n_groups * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("slope_den",
        expr("n_groups * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .select(col("n_groups"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        col("slope_num"), col("slope_den"),
        when(col("slope_den") > 0L, expr(
          "CAST(slope_num * 1000000 div slope_den AS BIGINT)"))
          .as("taylor_b_e6"))
  }
}
