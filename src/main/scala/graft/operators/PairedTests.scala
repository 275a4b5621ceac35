package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired / stratified hypothesis tests for model-eval and
  * experimentation pipelines, in exact integer arithmetic.
  *
  * Three operators that were missing from the eval/experimentation
  * family:
  *
  *  - [[mcnemarE6]] — McNemar's test on the discordant cells of a
  *    paired classifier comparison (the "is model B actually better
  *    than model A on the SAME items" test every eval harness runs
  *    before promoting a checkpoint);
  *  - [[mantelHaenszelE6]] — the Mantel–Haenszel common odds ratio and
  *    the continuity-corrected Cochran–Mantel–Haenszel statistic over
  *    stratified 2×2 tables (the stratified A/B readout when assignment
  *    is confounded with a blocking factor);
  *  - [[jackknifeRatioE6]] — delete-one-bucket jackknife variance for a
  *    ratio metric (the production-standard error bar for ratio
  *    metrics, where the delta method is the approximation and the
  *    bucket jackknife is what search/ads pipelines actually ship).
  *
  * Exactness convention (house rules, mirrored literally in each
  * oracle): all products are widened to DECIMAL(38,0) before
  * multiplying, every division is a truncating `div` toward zero
  * (DuckDB `//` on HUGEINT matches), per-stratum fractional terms are
  * truncated at e6 scale BEFORE summing (the same documented two-stage
  * truncation [[Causal.postStratifiedAte]] pins), and square roots use
  * the corrected isqrt (float sqrt then ±1 fix-up against the exact
  * square — cannot be off by more than 1 ulp at DECIMAL(38,0) scale,
  * and the correction makes it exact).
  *
  * Scale shape: each operator makes exactly ONE pass over the raw
  * data — a hash aggregate to group/stratum/bucket grain — and every
  * subsequent step runs on that (bounded) census. No windows over raw
  * rows, no joins except the caller's own dimension lookups.
  */
object PairedTests {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Corrected integer square root of a non-negative DECIMAL(38,0)
    * column: float seed, then a ±1 fix-up in exact arithmetic. The
    * fix-up squares in DECIMAL(38,0) so no LONG overflow exists for
    * any representable input (same guard the q335 advantage path
    * uses). */
  private def isqrtCols(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn("__s0",
        expr(s"CAST(floor(sqrt(CAST($in AS DOUBLE))) AS BIGINT)"))
      .withColumn(out, expr(
        s"""CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > $in THEN __s0 - 1
           | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= $in
           |   THEN __s0 + 1
           | ELSE __s0 END""".stripMargin))
      .drop("__s0")

  /** McNemar's test per group over a paired classifier comparison.
    *
    * Input is one row per evaluated item with two boolean "was this
    * model correct" columns. Per group the 2×2 paired table is
    * {n11, n10, n01, n00} (A-correct×B-correct), the discordant mass
    * is b + c = n10 + n01, and the Edwards continuity-corrected
    * statistic is
    *
    *   mcnemar_e6 = max(|b − c| − 1, 0)² · 1e6 div (b + c)
    *
    * (NULL when there are no discordant pairs — the test is undefined
    * and ANY imputation would be a lie). The max(·, 0) clamp is pinned:
    * the classical (|b−c|−1)² reads 1 when b = c, which overstates
    * evidence in the exactly-tied case; both engines compute the
    * clamped form.
    *
    * Shape: ONE hash aggregate from item grain to group grain; the
    * statistic is scalar arithmetic on the group census. Counts are
    * LONGs; the square widens to DECIMAL(38,0) so b+c up to ~9e18 is
    * safe. */
  def mcnemarE6(df: DataFrame, groupCols: Seq[String], correctA: Column,
      correctB: Column): DataFrame = {
    val g = df.select(groupCols.map(col) :+
        correctA.cast("boolean").as("__a") :+
        correctB.cast("boolean").as("__b"): _*)
      .where(col("__a").isNotNull && col("__b").isNotNull)
    g.groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n00"))
      .withColumn("discordant", col("n10") + col("n01"))
      .withColumn("mcnemar_e6", expr(
        """CASE WHEN n10 + n01 = 0 THEN NULL
          | ELSE CAST(CAST(greatest(abs(n10 - n01) - 1, 0) AS DECIMAL(38,0))
          |   * greatest(abs(n10 - n01) - 1, 0) * 1000000
          |   div (n10 + n01) AS BIGINT) END""".stripMargin))
  }

  /** Cochran's Q — the k-model generalization of [[mcnemarE6]]: did
    * ANY of k classifiers, scored on the SAME items, perform
    * differently? With x_ij ∈ {0,1}, G_j = per-model successes,
    * L_i = per-item successes, T = ΣG = ΣL:
    *
    *   q_e6 = (k−1) · (k·ΣG² − T²) · 1e6 div (k·T − ΣL²)
    *
    * (χ², k−1 df; NULL when the denominator is 0 — every item all-
    * correct or all-wrong carries no discrimination and a frame made
    * only of those has no test). Items missing some model's verdict
    * violate the complete-block design: they are DROPPED and counted
    * in `n_dropped` rather than silently biasing T.
    *
    * Shape: one hash aggregate to item grain (the only raw-data pass —
    * it carries L_i and the per-item model mask), one model-grain and
    * one scalar aggregate on top. Everything widens to DECIMAL(38,0)
    * before squaring, so T up to ~1e18 is safe; q_e6 = Q·1e6 with
    * Q ≤ n·(k−1), so the LONG output holds to n ≈ 9e12/k rows. The
    * persisted item frame lives until the caller's clearCache (the
    * collocations contract — three consumers share it lazily). */
  def cochranQE6(df: DataFrame, itemCols: Seq[String], model: Column,
      correct: Column, assumeComplete: Boolean = false): DataFrame = {
    // ONE pass to item grain carrying L_i, the completeness count, and
    // the per-model verdict list (k-bounded per item) — the model
    // census then explodes the KEPT items' lists off the persisted
    // item frame instead of semi-joining a second source scan (the
    // join shape cost a second scan + two sorted big shuffles).
    // Input contract: one verdict per (item, model).
    //
    // `assumeComplete` — the caller DECLARES the complete-block design
    // (e.g. every k verdicts live structurally on one source row, the
    // q373 stack shape), like the declared-unique-key contract of the
    // aggregate-elimination rule. The completeness machinery (verdict
    // lists, persist, keep mask) then disappears: one LIGHT item-grain
    // hash aggregate for Σ L, Σ L² plus one map-side-combined k-row
    // model aggregate for Σ G² — measured 9→3 s at sf0.1 on q373.
    // Output is IDENTICAL to the general path when the declaration
    // holds (n_dropped = 0 by construction); a false declaration
    // biases T exactly like it would bias any declared contract.
    val base = df.select(itemCols.map(col) :+ model.as("__m") :+
        correct.cast("boolean").as("__x"): _*)
      .where(col("__m").isNotNull && col("__x").isNotNull)
    if (assumeComplete) return cochranCompleteE6(base, itemCols)
    val items = base.groupBy(itemCols.map(col): _*)
      .agg(count_distinct(col("__m")).as("__km"),
        sum(when(col("__x"), 1L).otherwise(0L)).as("__l"),
        collect_list(struct(col("__m").as("m"), col("__x").as("x")))
          .as("__mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val models = broadcast(items.select(explode(col("__mx")).as("e"))
      .agg(count_distinct(col("e.m")).as("k")))
    val complete = items.crossJoin(models)
      .withColumn("__keep", col("__km") === col("k"))
    val itemStats = complete.agg(
      max(col("k")).as("k"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_items"),
      sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_dropped"),
      sum(when(col("__keep"), col("__l")).otherwise(lit(0L))).as("t"),
      sum(when(col("__keep"), dec(col("__l")) * col("__l"))
        .otherwise(dec(lit(0)))).cast("decimal(38,0)").as("sum_l2"))
    val g = complete.where(col("__keep"))
      .select(explode(col("__mx")).as("e"))
      .groupBy(col("e.m"))
      .agg(sum(when(col("e.x"), 1L).otherwise(0L)).as("__g"))
      .agg(sum(dec(col("__g")) * col("__g")).cast("decimal(38,0)")
        .as("sum_g2"))
    itemStats.crossJoin(broadcast(g))
      .withColumn("q_e6", expr(
        """CASE WHEN CAST(k AS DECIMAL(38,0)) * t - sum_l2 = 0 THEN NULL
          | ELSE CAST((k - 1) * (k * sum_g2
          |    - CAST(t AS DECIMAL(38,0)) * t) * 1000000
          |   div (CAST(k AS DECIMAL(38,0)) * t - sum_l2) AS BIGINT) END"""
          .stripMargin))
      .select(col("k"), col("n_items"), col("n_dropped"), col("t"),
        col("sum_g2"), col("sum_l2"), col("q_e6"))
  }

  /** The declared-complete Cochran Q fast path — see [[cochranQE6]]'s
    * `assumeComplete` contract. Same output schema and values as the
    * general path on complete designs (PairedTestsSpec pins it). */
  private def cochranCompleteE6(base: DataFrame,
      itemCols: Seq[String]): DataFrame = {
    val models = broadcast(base.agg(count_distinct(col("__m")).as("k")))
    val itemStats = base.groupBy(itemCols.map(col): _*)
      .agg(sum(when(col("__x"), 1L).otherwise(0L)).as("__l"))
      .agg(count(lit(1)).as("n_items"), sum(col("__l")).as("t"),
        sum(dec(col("__l")) * col("__l")).cast("decimal(38,0)")
          .as("sum_l2"))
    val g = base.groupBy(col("__m"))
      .agg(sum(when(col("__x"), 1L).otherwise(0L)).as("__g"))
      .agg(sum(dec(col("__g")) * col("__g")).cast("decimal(38,0)")
        .as("sum_g2"))
    itemStats.crossJoin(models).crossJoin(broadcast(g))
      .withColumn("n_dropped", lit(0L))
      .withColumn("q_e6", expr(
        """CASE WHEN CAST(k AS DECIMAL(38,0)) * t - sum_l2 = 0 THEN NULL
          | ELSE CAST((k - 1) * (k * sum_g2
          |    - CAST(t AS DECIMAL(38,0)) * t) * 1000000
          |   div (CAST(k AS DECIMAL(38,0)) * t - sum_l2) AS BIGINT) END"""
          .stripMargin))
      .select(col("k"), col("n_items"), col("n_dropped"), col("t"),
        col("sum_g2"), col("sum_l2"), col("q_e6"))
  }

  /** Mantel–Haenszel common odds ratio + continuity-corrected CMH
    * statistic over stratified 2×2 tables, one output row.
    *
    * Per stratum k with cells a (treated∧outcome), b (treated∧¬),
    * c (¬treated∧outcome), d (neither), n = a+b+c+d, the classical
    * quantities are fractions with per-stratum denominators; the
    * pinned integer form truncates EACH stratum's term at e6 scale and
    * sums (documented two-stage truncation — the identity holds up to
    * that truncation, and both engines compute the identical form):
    *
    *   R      = Σ_k (a·d·1e6) div n
    *   S      = Σ_k (b·c·1e6) div n          → or_mh_e6 = R·1e6 div S
    *   dev_e6 = Σ_k ((a·n − (a+b)·(a+c))·1e6) div n   [Σ (a − E[a])]
    *   var_e6 = Σ_{k: n≥2} (((a+b)·(c+d)·1e6) div n) · (a+c) · (b+d)
    *                        div (n·(n−1))
    *   cmh_e6 = max(|dev_e6| − 5e5, 0)² div var_e6    [χ², 1 df, e6]
    *
    * Domain contract: cmh_e6 is the χ² value at e6 scale and must fit
    * LONG — since χ² ≤ n for a 2×2 family, that holds to
    * n_total ≈ 9e12 rows; past it Spark's decimal `div` NULLs while
    * DuckDB keeps going (same contract class as q344's).
    *
    * or_mh_e6 is NULL when S = 0 (no discordant product mass);
    * cmh_e6 is NULL when var_e6 = 0. The var term's two-stage
    * truncation keeps the widest product at ~6e4·n³ per stratum —
    * inside DECIMAL(38,0) to n ≈ 2e11 rows per stratum, far past any
    * real stratum.
    *
    * Shape: ONE hash aggregate to stratum grain (the only raw-data
    * pass), scalar term arithmetic on the stratum census, one global
    * aggregate of the (bounded) strata. */
  def mantelHaenszelE6(df: DataFrame, stratumCols: Seq[String],
      treated: Column, outcome: Column): DataFrame = {
    val cells = df.select(stratumCols.map(col) :+
        treated.cast("boolean").as("__t") :+
        outcome.cast("boolean").as("__o"): _*)
      .where(col("__t").isNotNull && col("__o").isNotNull)
      .groupBy(stratumCols.map(col): _*)
      .agg(
        sum(when(col("__t") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__t") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__t") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__t") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .where(col("n") > 0L)
    val terms = cells
      .withColumn("__r", expr(
        "CAST(a AS DECIMAL(38,0)) * d * 1000000 div n"))
      .withColumn("__s", expr(
        "CAST(b AS DECIMAL(38,0)) * c * 1000000 div n"))
      .withColumn("__dev", expr(
        """(CAST(a AS DECIMAL(38,0)) * n
          | - CAST(a + b AS DECIMAL(38,0)) * (a + c)) * 1000000 div n"""
          .stripMargin))
      .withColumn("__var", expr(
        """CASE WHEN n < 2 THEN CAST(0 AS DECIMAL(38,0))
          | ELSE CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * 1000000
          |     div n AS DECIMAL(38,0))
          |   * (a + c) * (b + d)
          |   div (CAST(n AS DECIMAL(38,0)) * (n - 1)) END""".stripMargin))
    terms.agg(
        count(lit(1)).as("n_strata"),
        sum(col("n")).as("n_total"),
        sum(dec(col("__r"))).cast("decimal(38,0)").as("r_num"),
        sum(dec(col("__s"))).cast("decimal(38,0)").as("s_num"),
        sum(dec(col("__dev"))).cast("decimal(38,0)").as("dev_e6"),
        sum(dec(col("__var"))).cast("decimal(38,0)").as("var_e6"))
      .withColumn("or_mh_e6", expr(
        """CASE WHEN s_num = 0 THEN NULL
          | ELSE CAST(r_num * 1000000 div s_num AS BIGINT) END"""
          .stripMargin))
      .withColumn("cmh_e6", expr(
        """CASE WHEN var_e6 = 0 THEN NULL
          | ELSE CAST(CAST(greatest(abs(dev_e6) - 500000, 0)
          |     AS DECIMAL(38,0))
          |   * greatest(abs(dev_e6) - 500000, 0)
          |   div var_e6 AS BIGINT) END""".stripMargin))
      .withColumn("dev_e6", col("dev_e6").cast("long"))
      .select(col("n_strata"), col("n_total"), col("r_num"), col("s_num"),
        col("or_mh_e6"), col("dev_e6"), col("var_e6"), col("cmh_e6"))
  }

  /** Deterministic Poisson bootstrap CI for a ratio metric, per group —
    * the OTHER production error bar (the jackknife's resampling
    * sibling): every row joins replicate r with a Poisson(1) weight, so
    * a replicate is one map-side-combinable weighted sum and the whole
    * bootstrap is ONE pass (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams" — the Google production
    * scheme).
    *
    * Determinism (pinned, mirrored in the oracle): the weight for
    * (row, r) is Poisson(1) by inverse-CDF over a Lehmer chain,
    *
    *   s     = pmod(rowKey, 2³¹−1)
    *   h     = pmod((s·65537 + r + 1) · 48271, 2³¹−1)
    *   u_e9  = h·1e9 div (2³¹−1)
    *   w     = #{thresholds ≤ u_e9} over the e9-floored Poisson(1) CDF
    *           {367879441, 735758882, 919698602, 981011843, 996340153,
    *            999405815}, capped at 6
    *
    * — wrap-free LONG arithmetic both engines replay exactly (q350's
    * PRNG discipline). Replicate estimates are truncating e6 ratios;
    * the interval is the PINNED order statistic pair (2nd smallest,
    * (valid−1)-th) over the ≤`reps` replicate estimates — ≈ the
    * 2.5/97.5 percentile pair at the default reps = 40. Replicates
    * whose resampled denominator is 0 are excluded and counted;
    * fewer than 4 valid replicates → NULL interval.
    *
    * Shape: one explode of `reps` replicate ids per row (CPU ×reps on
    * the scan, embarrassingly parallel) feeding ONE hash aggregate to
    * (group, replicate) grain — partial aggregation collapses the
    * blow-up map-side, so the shuffle carries groups×reps rows only;
    * the order statistics are windows over ≤reps rows per group. */
  def poissonBootstrapRatioE6(df: DataFrame, groupCols: Seq[String],
      rowKey: Column, num: Column, den: Column,
      reps: Int = 40): DataFrame = {
    require(reps >= 4 && reps <= 1000)
    val m = 2147483647L
    val base = df.select(groupCols.map(col) :+
        rowKey.cast("long").as("__rk") :+
        num.cast("long").as("__num") :+ den.cast("long").as("__den"): _*)
      .where(col("__rk").isNotNull)
      .withColumn("__r", explode(sequence(lit(0), lit(reps - 1))))
      // two Lehmer steps with an XOR-fold between them: a purely
      // multiplicative chain is AFFINE in rk mod m, and an affine map
      // preserves arithmetic structure shared with the metric (a
      // partkey-derived price correlated with a partkey-derived rk made
      // every replicate 0.3% hot in testing); the fold breaks affinity
      // with operations both engines replay wrap-free on BIGINT
      .withColumn("__h1", expr(
        s"pmod((pmod(__rk, ${m}L) * 65537 + __r + 1) * 48271, ${m}L)"))
      .withColumn("__u", expr(
        s"""pmod((__h1 ^ (__h1 div 65536)) * 69621, ${m}L)
           | * 1000000000 div ${m}L""".stripMargin))
      .withColumn("__w", expr(
        """CAST(CASE WHEN __u < 367879441 THEN 0
          | WHEN __u < 735758882 THEN 1
          | WHEN __u < 919698602 THEN 2
          | WHEN __u < 981011843 THEN 3
          | WHEN __u < 996340153 THEN 4
          | WHEN __u < 999405815 THEN 5
          | ELSE 6 END AS BIGINT)""".stripMargin))
    val repSums = base.groupBy(groupCols.map(col) :+ col("__r"): _*)
      .agg(sum((col("__w") * col("__num")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__sn"),
        sum((col("__w") * col("__den")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__sd"),
        sum(col("__num").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__pn"),
        sum(col("__den").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__pd"))
      .withColumn("__theta", expr(
        """CASE WHEN __sd <= 0 THEN NULL
          | ELSE CAST(__sn * 1000000 div __sd AS BIGINT) END"""
          .stripMargin))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__theta").asc_nulls_last, col("__r"))
    val ranked = repSums
      .withColumn("__rank", row_number().over(w))
      .withColumn("__valid",
        count(col("__theta")).over(Window.partitionBy(
          groupCols.map(col): _*)))
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("__valid")).as("reps_valid"),
        max(when(col("__pd") > 0,
          expr("CAST(__pn * 1000000 div __pd AS BIGINT)")))
          .as("theta_e6"),
        max(when(col("__rank") === 2, col("__theta"))).as("__lo"),
        max(when(col("__rank") === col("__valid") - 1, col("__theta")))
          .as("__hi"))
      .select(groupCols.map(col) ++ Seq(col("reps_valid"),
        col("theta_e6"),
        when(col("reps_valid") < 4, lit(null).cast("long"))
          .otherwise(col("__lo")).as("ci_lo_e6"),
        when(col("reps_valid") < 4, lit(null).cast("long"))
          .otherwise(col("__hi")).as("ci_hi_e6")): _*)
  }

  /** Delete-one-bucket jackknife variance for a ratio metric, per
    * group.
    *
    * Units are pre-bucketed (the caller supplies the bucket column —
    * typically hash(unit) mod B so whole units leave together and
    * within-unit correlation is respected). Per group:
    *
    *   S, N        = Σ num, Σ den over all buckets
    *   theta_e6    = S·1e6 div N                     (point estimate)
    *   loo_i_e6    = (S − s_i)·1e6 div (N − n_i)     (leave-one-out)
    *   m_e6        = Σ loo_i div B_eff               (jackknife mean)
    *   jk_var_e12  = (B_eff−1) · Σ (loo_i − m)² div B_eff
    *   jk_se_e6    = isqrt(jk_var_e12)
    *
    * Buckets whose removal empties the denominator (N − n_i ≤ 0) are
    * excluded from the resample set; B_eff counts the buckets that
    * participate, and the caller sees both counts. Degenerate groups
    * (N ≤ 0 or B_eff = 0) emit NULL estimates rather than inventing a
    * number.
    *
    * Shape: ONE hash aggregate from row grain to (group, bucket) grain
    * — the only raw-data pass; totals, leave-one-out values and
    * moments are windows/aggregates over the B-row-per-group census
    * (B is a caller-chosen constant, canonically 32–200). */
  def jackknifeRatioE6(df: DataFrame, groupCols: Seq[String],
      bucket: Column, num: Column, den: Column): DataFrame = {
    val perBucket = df.select(groupCols.map(col) :+
        bucket.as("__bk") :+
        num.cast("long").as("__num") :+ den.cast("long").as("__den"): _*)
      .where(col("__bk").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__bk"): _*)
      .agg(sum(col("__num")).as("s_i"), sum(col("__den")).as("n_i"))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val loo = perBucket
      .withColumn("__S", sum(col("s_i")).over(w))
      .withColumn("__N", sum(col("n_i")).over(w))
      .withColumn("loo_e6", expr(
        """CASE WHEN __N - n_i <= 0 THEN NULL
          | ELSE CAST(__S - s_i AS DECIMAL(38,0)) * 1000000
          |   div (__N - n_i) END""".stripMargin).cast("long"))
    val withMean = loo
      .withColumn("__beff",
        count(when(col("loo_e6").isNotNull, 1L)).over(w))
      .withColumn("__sumloo",
        sum(dec(col("loo_e6"))).over(w).cast("decimal(38,0)"))
      .withColumn("__m_e6",
        when(col("__beff") === 0L, lit(null).cast("long"))
          .otherwise(expr("CAST(__sumloo div __beff AS BIGINT)")))
    val agg = withMean.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("__beff")).as("b_eff"),
        max(col("__S")).as("__S"),
        max(col("__N")).as("__N"),
        max(col("__m_e6")).as("jk_mean_e6"),
        sum(when(col("loo_e6").isNotNull,
          dec(col("loo_e6") - col("__m_e6")) *
            dec(col("loo_e6") - col("__m_e6")))
          .otherwise(dec(lit(0)))).cast("decimal(38,0)").as("__ss"))
      .withColumn("theta_e6", expr(
        """CASE WHEN __N <= 0 THEN NULL
          | ELSE CAST(CAST(__S AS DECIMAL(38,0)) * 1000000
          |   div __N AS BIGINT) END""".stripMargin))
      // (b_eff−1)·Σ(loo−m)² can exceed BIGINT·b_eff, and Spark's `div`
      // yields LONG (it wrapped negative at sf0.001) — floor-divide in
      // DECIMAL via the exact (a − a mod b)/b identity instead
      .withColumn("__ja", expr(
        "CAST(CAST(b_eff - 1 AS DECIMAL(38,0)) * __ss AS DECIMAL(38,0))"))
      .withColumn("jk_var_e12", expr(
        """CASE WHEN b_eff <= 1 THEN NULL
          | ELSE CAST((__ja - pmod(__ja, b_eff)) / b_eff
          |  AS DECIMAL(38,0)) END""".stripMargin))
    isqrtCols(
        agg.withColumn("__v", coalesce(col("jk_var_e12"), dec(lit(0)))),
        "__v", "__se")
      .withColumn("jk_se_e6",
        when(col("jk_var_e12").isNull, lit(null).cast("long"))
          .otherwise(col("__se")))
      .select(groupCols.map(col) ++ Seq(col("n_buckets"), col("b_eff"),
        col("theta_e6"), col("jk_mean_e6"), col("jk_var_e12"),
        col("jk_se_e6")): _*)
  }
}
