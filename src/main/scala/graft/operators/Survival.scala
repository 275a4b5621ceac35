package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival analysis (Kaplan & Meier 1958) over
  * right-censored durations — time-to-conversion, churn, time-to-repeat
  * — as the exact life-table of sufficient statistics.
  *
  * Input: one row per subject with an integer `duration` (time units
  * until the event, or until last observation when censored) and an
  * `observed` flag (false = right-censored). Output: one row per
  * distinct duration at which ≥1 event occurred, with
  *
  *  - `n_risk`   — subjects still at risk at t (duration ≥ t),
  *  - `n_events` — events exactly at t,
  *  - `hazard_ppm` = 1e6·n_events div n_risk (the KM factor 1−d/n in
  *    exact integer form; the survival curve is the running product of
  *    (1 − hazard), which callers with float tolerance can fold).
  *
  * Scale shape: the raw pass is ONE hash aggregate keyed by duration
  * (map-side combined), collapsing 100 TB of subjects to one row per
  * distinct time unit. The risk-set cumulation then runs as a single
  * unpartitioned window over that tiny time axis — bounded by the time
  * resolution (e.g. ≤ a few thousand hourly buckets), never by the
  * subject count, so the one-partition window is on the census side of
  * the plan, same as every cumulative-census gate here.
  */
object Survival {

  def kaplanMeier(df: DataFrame, duration: Column,
      observed: Column): DataFrame = {
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("n_events"))
    val w = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perT.withColumn("n_risk", Census.guardLong(sum(col("n_at")).over(w),
        count(lit(1)).over(whole), "Survival.kaplanMeier"))
      .where(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"),
        expr("1000000 * n_events div n_risk").as("hazard_ppm"))
  }

  /** Nelson–Aalen cumulative-hazard estimator (Nelson 1972, Aalen 1978)
    * — [[kaplanMeier]]'s additive sibling: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ.
    * Because the estimator is a SUM of per-time ratios (not a product),
    * it stays exact in integers end-to-end: each increment truncates to
    * e9 and the cumulation is a LONG prefix sum over the same
    * time-census frame — no float ever, unlike the KM product which
    * callers fold themselves.
    *
    * Output per event time: n_risk, n_events, the e9 increment, and
    * `cum_hazard_e9` = Σ increments (the curve point). Same scale shape
    * as kaplanMeier: one subject-collapsing aggregate, then windows over
    * the tiny time axis. */
  def nelsonAalen(df: DataFrame, duration: Column,
      observed: Column): DataFrame = {
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("n_events"))
    val wRisk = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perT.withColumn("n_risk", Census.guardLong(sum(col("n_at")).over(wRisk),
        count(lit(1)).over(whole), "Survival.nelsonAalen"))
      .withColumn("inc_e9",
        expr("1000000000 * n_events div n_risk"))
      .withColumn("cum_hazard_e9",
        sum(when(col("n_events") > 0, col("inc_e9")).otherwise(0L))
          .over(wCum))
      .where(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"), col("inc_e9"),
        col("cum_hazard_e9"))
  }

  /** Two-sample LOG-RANK test (Mantel 1966; Peto & Peto 1972) — "do two
    * survival curves differ", the inferential companion to the q214/q236
    * estimators: at each event time, group 1's observed events compare
    * against the hypergeometric expectation under H₀,
    *
    *   E₁ⱼ = dⱼ·n₁ⱼ/nⱼ,
    *   Vⱼ  = n₁ⱼ·n₂ⱼ·dⱼ·(nⱼ−dⱼ) / (nⱼ²·(nⱼ−1)),
    *   χ²  = (ΣO₁ − ΣE₁)² / ΣV   ~  χ²₁.
    *
    * Integer discipline: E-terms truncate to e9 and V-terms to e12
    * BEFORE summation (the no-raw-double-SUM rule; per-term truncation
    * is deterministic in any partitioning), the statistic lands as
    * chi2_e6 = (O·1e9 − E_e9)² div V_e12 in DECIMAL(38,0), and the 95%
    * verdict compares against the literal 3841458 (χ²₁ 0.95, e6).
    * Single-event times with nⱼ ≤ 1 contribute no variance and are
    * skipped in V (standard).
    *
    * Scale shape: one subject-collapsing census per (time, group
    * arrivals/events), two descending windows over the tiny time axis,
    * one single-row reduction. Output: one row
    * (o1, e1_e9, var_e12, chi2_e6, significant_95). */
  def logRank(df: DataFrame, duration: Column, observed: Column,
      group1: Column): DataFrame = {
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"),
        group1.cast("boolean").as("g1"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(
        sum(when(col("g1"), 1L).otherwise(0L)).as("a1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("a2"),
        sum(when(col("g1") && col("obs"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("g1") && col("obs"), 1L).otherwise(0L)).as("d2"))
    val w = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val terms = perT
      .withColumn("n1", Census.guardLong(sum(col("a1")).over(w),
        count(lit(1)).over(whole), "Survival.logRank"))
      .withColumn("n2", sum(col("a2")).over(w))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .where(col("d") > 0)
      // DECIMAL(38,0) intermediate like v_e12 below: pure-LONG
      // d·n1·1e9 overflows once d·n1 ≳ 9.2e9 (a few thousand deaths at
      // a few-million-subject risk set) — silently wrong chi2 non-ANSI,
      // runtime error under ANSI. The quotient itself always fits LONG
      // (e1_e9 ≤ d·1e9).
      .withColumn("e1_e9", expr(
        "CAST(CAST(d AS DECIMAL(38,0)) * n1 * 1000000000 div n AS BIGINT)"))
      .withColumn("v_e12", when(col("n") > 1, expr(
        """CAST(n1 AS DECIMAL(38,0)) * n2 * d * (n - d) * 1000000000000
          |div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"""
          .stripMargin).cast("long")).otherwise(0L))
    terms.agg(sum(col("d1")).as("o1"), sum(col("e1_e9")).as("e1_e9"),
        sum(col("v_e12")).as("var_e12"))
      .withColumn("chi2_e6", expr(
        """CASE WHEN var_e12 = 0 THEN NULL ELSE CAST(
          |  CAST(o1 * 1000000000L - e1_e9 AS DECIMAL(38,0))
          |  * (o1 * 1000000000L - e1_e9) div var_e12 AS BIGINT) END"""
          .stripMargin))
      .withColumn("significant_95",
        coalesce(col("chi2_e6") > 3841458L, lit(false)))
  }

  /** Aalen–Johansen cumulative-incidence estimator under COMPETING
    * RISKS (Aalen & Johansen 1978) — the correct replacement for
    * "1 − KM per cause" when subjects can exit by more than one first
    * event (converted vs churned, purchased vs errored-out): naive
    * per-cause KM treats the competing event as censoring and
    * overstates every curve; the AJ estimator splits the overall
    * survival mass among causes so the CIFs and overall survival are
    * jointly coherent (CIF₁ + CIF₂ + S = 1 up to truncation).
    *
    * Input: one row per subject, integer `duration`, `cause` ∈
    * {0 = censored, 1, 2}. At each distinct time t with risk set n and
    * cause-k events d_k, with S(t−) the e6 survival just before t:
    *
    *   inc_k    = S(t−) · d_k div n          (e6)
    *   CIF_k(t) = Σ_{s ≤ t} inc_k(s)
    *   S(t)     = S(t−) · (n − d₁ − d₂) div n
    *
    * — a LINEAR RECURRENCE in S (a running truncating product, not a
    * sum), which no window aggregate expresses. The house resolution,
    * same as [[ExactQuantiles]]: the raw pass is still the ONE
    * subject-collapsing hash aggregate to the time census; the fold
    * runs driver-side over that census behind a loud `maxCensusRows`
    * guard (bounded-fetch: `limit(max+1)` so even a violating plan
    * never drags data to the driver), in BigInt so no intermediate
    * overflows. The oracle replays the recurrence as a recursive CTE
    * over the ranked census in HUGEINT.
    *
    * Output: one row per EVENT time (d₁+d₂ > 0): t, n_risk, d1, d2,
    * s_minus_e6 (survival entering t), cif1_e6, cif2_e6. Bounded-
    * domain contract: distinct durations ≤ `maxCensusRows` (time
    * resolution, e.g. hour grain — the q319 discipline). */
  /** Cox proportional-hazards SCORE test at β = 0 for one bounded
    * integer covariate (Cox 1972; the score/log-rank-trend form —
    * "does x shift the hazard", without fitting β): at each event
    * time j with risk set R_j (size n, covariate sums sx = Σx,
    * sxx = Σx²) and d events whose covariate sum is sxd,
    *
    *   u_e9(j)  = sxd·1e9 − d·sx·1e9 div n
    *   v_e12(j) = d·(n·sxx − sx²)·(n − d)·1e12
    *              div (n²·(n − 1))                    (0 when n ≤ 1)
    *   chi2_e6  = U_e9² div ΣV_e12                    (U = Σu)
    *
    * — the hypergeometric mean/variance of the covariate within each
    * risk set, exactly the q218 log-rank generalized from a binary
    * group to an integer covariate. Per-term truncation before
    * summing (deterministic under any partitioning); quadratics in
    * DECIMAL(38,0).
    *
    * Scale shape: one subject-collapsing census keyed by time
    * (carrying n_at, Σx, Σx², d, Σx_events), three descending
    * cumulative windows over the guarded time census, a single-row
    * reduction. Output: (n_times, o_sxd, u_e9, var_e12, chi2_e6,
    * significant_95 at χ²₁ 0.95). */
  def coxScoreTest(df: DataFrame, duration: Column, observed: Column,
      covariate: Column): DataFrame = {
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"),
        covariate.cast("long").as("x"))
      .where(col("t").isNotNull && col("t") >= 0 && col("x").isNotNull)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("x")).as("sx_at"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx_at"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        sum(when(col("obs"), col("x")).otherwise(0L)).as("sxd"))
    val w = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val terms = perT
      .withColumn("n", Census.guardLong(sum(col("n_at")).over(w),
        count(lit(1)).over(whole), "Survival.coxScoreTest"))
      .withColumn("sx", sum(col("sx_at")).over(w))
      .withColumn("sxx", sum(col("sxx_at")).over(w))
      .where(col("d") > 0)
      .withColumn("u_e9", expr(
        """sxd * 1000000000 - CAST(CAST(d AS DECIMAL(38,0)) * sx
          | * 1000000000 div n AS BIGINT)""".stripMargin))
      .withColumn("v_e12", when(col("n") > 1, expr(
        """CAST(CAST(d AS DECIMAL(38,0))
          | * (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) * (n - d)
          | * 1000000000000
          | div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))
          | AS DECIMAL(38,0))""".stripMargin))
        .otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
    terms.agg(count(lit(1)).as("n_times"), sum(col("sxd")).as("o_sxd"),
        sum(col("u_e9")).as("u_e9"), sum(col("v_e12")).as("var_e12"))
      .withColumn("chi2_e6", when(col("var_e12") > 0L, expr(
        """CAST(CAST(u_e9 AS DECIMAL(38,0)) * u_e9 div var_e12
          |AS BIGINT)""".stripMargin)))
      .withColumn("significant_95",
        coalesce(col("chi2_e6") > 3841458L, lit(false)))
  }

  /** Gehan–Wilcoxon weighted log-rank (Gehan 1965; the Breslow
    * generalization): [[logRank]] with each event time weighted by its
    * risk-set size n_j — early differences count for more, the
    * standard companion readout when hazards cross late:
    *
    *   O_w = Σ n_j·d1_j,   E_w_e9 = Σ n_j·e1_e9(j),
    *   V_w_e12 = Σ n_j²·v_e12(j),
    *   chi2_e6 = (O_w·1e9 − E_w_e9)² div V_w_e12
    *
    * reusing the q218 per-time terms exactly (per-term truncation
    * before weighting is the pinned order). n-weighted sums leave LONG
    * fast, so O/E/V live in DECIMAL(38,0) and are emitted as such.
    * Same census shape as [[logRank]]. */
  def gehanWilcoxon(df: DataFrame, duration: Column, observed: Column,
      group1: Column): DataFrame = {
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"),
        group1.cast("boolean").as("g1"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(
        sum(when(col("g1"), 1L).otherwise(0L)).as("a1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("a2"),
        sum(when(col("g1") && col("obs"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("g1") && col("obs"), 1L).otherwise(0L)).as("d2"))
    val w = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val terms = perT
      .withColumn("n1", Census.guardLong(sum(col("a1")).over(w),
        count(lit(1)).over(whole), "Survival.gehanWilcoxon"))
      .withColumn("n2", sum(col("a2")).over(w))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .where(col("d") > 0)
      .withColumn("e1_e9", expr(
        "CAST(CAST(d AS DECIMAL(38,0)) * n1 * 1000000000 div n AS BIGINT)"))
      .withColumn("v_e12", when(col("n") > 1, expr(
        """CAST(n1 AS DECIMAL(38,0)) * n2 * d * (n - d) * 1000000000000
          |div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"""
          .stripMargin).cast("long")).otherwise(0L))
    terms.agg(
        sum(expr("CAST(n AS DECIMAL(38,0)) * d1")).as("o_w"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * e1_e9")).as("e_w_e9"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n * v_e12")).as("v_w_e12"))
      .withColumn("chi2_e6", when(col("v_w_e12") > 0L, expr(
        """CAST((o_w * 1000000000 - e_w_e9)
          | * (o_w * 1000000000 - e_w_e9) div v_w_e12 AS BIGINT)"""
          .stripMargin)))
      .withColumn("significant_95",
        coalesce(col("chi2_e6") > 3841458L, lit(false)))
  }

  /** Restricted mean survival time (Royston & Parmar 2013 for the
    * modern case; the estimand is classical): the area under the KM
    * curve up to a clinical horizon τ — "average event-free time in
    * the first τ units", the robust effect measure when proportional
    * hazards fail. Same truncating-product recurrence as
    * [[competingRisks]] (S is a running e6 product no window
    * expresses), so the same house resolution: one subject-collapsing
    * aggregate to the guarded time census, a driver-side BigInt fold,
    * a recursive-CTE oracle.
    *
    * rmst_e6 accumulates S(tᵢ₋₁)·(min(tᵢ, τ) − tᵢ₋₁) walking the
    * census ascending from t = 0 (S = 1e6 before the first event), and
    * closes with S(t_last)·(τ − t_last) when the curve outlives τ.
    * Output one row: (tau, n_subjects, n_events_le_tau, s_tau_e6,
    * rmst_e6 — time units · 1e6). */
  def restrictedMeanSurvival(df: DataFrame, duration: Column,
      observed: Column, tau: Long,
      maxCensusRows: Int = 100000): DataFrame = {
    require(tau > 0L, s"Survival.restrictedMeanSurvival: tau must be" +
      s" > 0, got $tau")
    val spark = df.sparkSession
    import spark.implicits._
    val perT = df.select(duration.cast("long").as("t"),
        observed.cast("boolean").as("obs"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("obs"), 1L).otherwise(0L)).as("d"))
    val census = perT.orderBy(col("t"))
      .limit(maxCensusRows + 1).collect()
    require(census.length <= maxCensusRows,
      s"Survival.restrictedMeanSurvival: time census exceeds" +
        s" $maxCensusRows rows — bucket durations first")
    var nRisk = census.iterator.map(_.getLong(1)).sum
    val nSubjects = nRisk
    var s = BigInt(1000000)
    var rmst = BigInt(0)
    var lastT = 0L
    var eventsLeTau = 0L
    census.foreach { r =>
      val t = r.getLong(0); val nAt = r.getLong(1); val d = r.getLong(2)
      if (lastT < tau) {
        rmst += s * (math.min(t, tau) - lastT)
        lastT = math.min(t, tau)
      }
      if (t <= tau) eventsLeTau += d
      // S stops evolving past τ: s is S(τ) at loop end (events AT τ
      // included — right-continuous convention, pinned)
      if (d > 0 && t <= tau) s = s * (BigInt(nRisk) - d) / nRisk
      nRisk -= nAt
    }
    if (lastT < tau) rmst += s * (tau - lastT)
    Seq((tau, nSubjects, eventsLeTau, s.toLong, rmst.toLong))
      .toDF("tau", "n_subjects", "n_events_le_tau", "s_tau_e6",
        "rmst_e6")
  }

  def competingRisks(df: DataFrame, duration: Column, cause: Column,
      maxCensusRows: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perT = df.select(duration.cast("long").as("t"),
        cause.cast("int").as("k"))
      .where(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("k") === 1, 1L).otherwise(0L)).as("d1"),
        sum(when(col("k") === 2, 1L).otherwise(0L)).as("d2"))
    val census = perT.orderBy(col("t"))
      .limit(maxCensusRows + 1).collect()
    require(census.length <= maxCensusRows,
      s"Survival.competingRisks: time census exceeds $maxCensusRows rows" +
        " — durations are data-grain, not domain-grain; bucket them" +
        " (e.g. to hours) before calling")
    var nRisk = census.iterator.map(_.getLong(1)).sum
    var s = BigInt(1000000)
    var c1 = BigInt(0)
    var c2 = BigInt(0)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    census.foreach { r =>
      val t = r.getLong(0); val nAt = r.getLong(1)
      val d1 = r.getLong(2); val d2 = r.getLong(3)
      c1 += s * d1 / nRisk
      c2 += s * d2 / nRisk
      val sNext = s * (BigInt(nRisk) - d1 - d2) / nRisk
      if (d1 + d2 > 0)
        out += ((t, nRisk, d1, d2, s.toLong, c1.toLong, c2.toLong))
      s = sNext
      nRisk -= nAt
    }
    out.toSeq.toDF("t", "n_risk", "d1", "d2", "s_minus_e6", "cif1_e6",
      "cif2_e6")
  }
}
