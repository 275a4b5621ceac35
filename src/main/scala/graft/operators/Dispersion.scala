package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

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
      .truncate(true) // point census + dropped count read it
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

  /** Ansari–Bradley two-sample SCALE test (Ansari & Bradley 1960) —
    * the rank test for "same center, different spread", the
    * nonparametric sibling of [[fanoNbE6]]'s parametric dispersion
    * screens: values rank over the POOLED sample and each gets the
    * center-folded score a = min(rank, N+1−rank); X's score sum being
    * small says X concentrates at the extremes (larger spread).
    *
    * Exactness: doubled pooled midranks (mr2 = 2·cumBelow + ties + 1)
    * keep tied scores integral — a2 = min(mr2, 2(N+1) − mr2), AB2 =
    * Σ_X a2. The CONDITIONAL null moments given the observed (tied)
    * scores are exact rationals off the score census (Hollander &
    * Wolfe §5.1 tie form):
    *
    *   E[AB2]   = n_x·S div N,          S  = Σ a2  (exact e6 output)
    *   Var[AB2] = n_x·n_y·(N·S2 − S²) / (N²·(N−1)),  S2 = Σ a2²
    *   z_e6 — ONE pinned double chain over those exact integers.
    *
    * Scale shape: one hash aggregate to the (group × value) census,
    * cumulative windows under the constant [[Census.onePartKey]]
    * partition on the VALUE census (never data grain), one global
    * aggregate. */
  def ansariBradleyE6(df: DataFrame, inX: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(inX.cast("boolean").as("x"),
        value.cast("long").as("v"))
      .where(col("x").isNotNull && col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(when(col("x"), 1L).otherwise(0L)).as("cx"),
        sum(when(!col("x"), 1L).otherwise(0L)).as("cy"))
    val w = Window.partitionBy(Census.onePartKey(col("v")))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(Census.onePartKey(col("v")))
      .orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = cells
      .withColumn("ct", col("cx") + col("cy"))
      .withColumn("n", sum(col("cx") + col("cy")).over(whole))
      .withColumn("mr2",
        lit(2L) * coalesce(sum(col("cx") + col("cy")).over(w), lit(0L))
          + col("ct") + lit(1L))
      .withColumn("a2", least(col("mr2"),
        lit(2L) * (col("n") + 1L) - col("mr2")))
    scored.agg(
        coalesce(sum(col("cx")), lit(0L)).as("n_x"),
        coalesce(sum(col("cy")), lit(0L)).as("n_y"),
        coalesce(sum(col("a2") * col("cx")), lit(0L)).as("ab2"),
        coalesce(sum(expr("CAST(a2 AS DECIMAL(38,0)) * (cx + cy)")),
          expr("CAST(0 AS DECIMAL(38,0))")).as("__s"),
        coalesce(sum(expr(
          "CAST(a2 AS DECIMAL(38,0)) * a2 * (cx + cy)")),
          expr("CAST(0 AS DECIMAL(38,0))")).as("__s2"))
      .withColumn("__vnum", expr(
        """CAST(n_x AS DECIMAL(38,0)) * n_y
          | * ((n_x + n_y) * __s2 - __s * __s)""".stripMargin))
      .select(col("n_x"), col("n_y"), col("ab2"),
        expr("""CAST(CAST(n_x AS DECIMAL(38,0)) * __s * 1000000
              | div (n_x + n_y) AS BIGINT)""".stripMargin)
          .as("e_ab2_e6"),
        expr(
          """CASE WHEN n_x + n_y < 2 OR __vnum <= 0 THEN 0
            | ELSE CAST(round((CAST(ab2 AS DOUBLE)
            |   - CAST(n_x AS DOUBLE) * CAST(__s AS DOUBLE)
            |     / (CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE)))
            |  / sqrt(CAST(__vnum AS DOUBLE)
            |   / ((CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE))
            |    * (CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE))
            |    * (CAST(n_x AS DOUBLE) + CAST(n_y AS DOUBLE) - 1.0)))
            |  * 1000000.0) AS BIGINT) END""".stripMargin).as("z_e6"))
  }

  /** Brown–Forsythe variance-homogeneity test (Brown & Forsythe 1974 —
    * Levene's test with the MEDIAN center, the robust form): per group
    * the absolute deviations z = |v − med_g| from the group's LOWER
    * median (smallest v with 2·cum ≥ n_g+1 — the [[OrdinalTests]]
    * pinned order statistic), then the one-way-ANOVA F on the z's:
    *
    *   A = Σ_g n_g(z̄_g − z̄)² = Σ_g ⌊S_g²/n_g⌋ − ⌊S²/N⌋   (between)
    *   B = ΣΣ(z − z̄_g)²      = Q − Σ_g ⌊S_g²/n_g⌋       (within)
    *   F_e6 = (N−k)·A·1e6 div ((k−1)·B)
    *
    * with S_g = Σz, Q = Σz² exact integers; A and B share the SAME
    * per-group floored term ⌊S_g²/n_g⌋ (the pinned order, clamped at
    * 0 against sub-integer truncation drift) and stay UN-scaled
    * DECIMAL(38,0) — S² ≫ LONG at warehouse scale, so the quotients
    * use the positive-operand floor identity (x − pmod(x, n))/n and
    * A/B emit as decStr-able decimals; only the final F carries the
    * e6. The gate every pooled-variance test should run first: F far
    * above 1 says the groups' spreads differ and a Welch form is
    * needed.
    *
    * Scale shape: one hash aggregate to the (group × value) census,
    * per-GROUP cumulative windows for the medians (real partitions),
    * re-join, two more hash aggregates to group then global grain. */
  def brownForsytheE6(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(group.as("g"), value.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .truncate(true) // median scan + deviation pass both read it
    val wLe = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("g"))
    val med = cells
      .withColumn("cum", sum(col("c")).over(wLe))
      .withColumn("ng", sum(col("c")).over(whole))
      .where(expr("2 * cum >= ng + 1"))
      .groupBy(col("g")).agg(min(col("v")).as("med"))
    val grp = cells.join(med, "g")
      .withColumn("z", abs(col("v") - col("med")))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ng"),
        sum(col("z") * col("c")).as("sg"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z * c")).as("qg"))
      // ⌊S_g²/n_g⌋ by the positive-operand floor identity — the plain
      // div would overflow its LONG result type at warehouse scale
      .withColumn("tg", expr(
        """CAST((CAST(sg AS DECIMAL(38,0)) * sg
          | - pmod(CAST(sg AS DECIMAL(38,0)) * sg, ng)) / ng
          | AS DECIMAL(38,0))""".stripMargin))
    grp.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("tg")).as("st"))
      .withColumn("__sn", expr(
        """CAST((CAST(s AS DECIMAL(38,0)) * s
          | - pmod(CAST(s AS DECIMAL(38,0)) * s, n)) / n
          | AS DECIMAL(38,0))""".stripMargin))
      .select(col("n"), col("k"),
        expr("""CAST(greatest(CAST(0 AS DECIMAL(38,0)), st - __sn)
              | AS DECIMAL(38,0))""".stripMargin).as("a_ss"),
        expr("""CAST(greatest(CAST(0 AS DECIMAL(38,0)), q - st)
              | AS DECIMAL(38,0))""".stripMargin).as("b_ss"))
      .withColumn("f_e6", expr(
        """CASE WHEN k < 2 OR b_ss = 0 THEN 0
          | ELSE CAST((n - k) * a_ss * 1000000
          |  div (CAST(k - 1 AS DECIMAL(38,0)) * b_ss) AS BIGINT)
          |END""".stripMargin))
  }
}
