package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Exact sample-efficiency curves for model-eval pipelines.
  *
  * Reference context: the reference's metric jobs stop at per-key
  * counters and rates (`pipeline/src/main` counter/metric jobs); an
  * LLM training pipeline additionally needs the *eval-curve* estimators
  * published for code/RLHF evaluation — pass@k (Chen et al. 2021,
  * "Evaluating Large Language Models Trained on Code", eq. 1), the
  * unbiased best-of-n reward curve (Nakano et al. 2021 WebGPT, app. I),
  * and Wilson lower-bound ranking for win rates (Wilson 1927; the
  * standard "sort variants by the lower confidence bound" rule). All
  * three run in exact integer arithmetic — DECIMAL(38,0) products,
  * truncating `div`, corrected integer sqrt — so the DuckDB oracle can
  * pin every output bit; no floating averages anywhere.
  *
  * Scale shape shared by all three: one hash aggregate (or one
  * group-partitioned window) to per-problem grain, then per-curve-point
  * single-row reductions. Nothing sorts globally; nothing collects.
  */
object EvalCurves {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  private def guardLe(c: Column, bound: Long, msg: Column): Column =
    c + coalesce(assert_true(c <= lit(bound), msg).cast("long"), lit(0L))

  /** pass@k curve — the unbiased estimator of Chen et al. 2021:
    * per problem with n samples and c successes,
    * pass@k = 1 − C(n−c, k)/C(n, k), averaged over problems with
    * n ≥ k. The binomial ratio telescopes to
    * Π_{i=0}^{k−1} (n−c−i)/(n−i): two exact DECIMAL(38,0) products,
    * so per-problem pass@k_e6 = 1e6 − num·1e6 div den is bit-exact and
    * oracle-replayable (num·1e6 ≤ den·1e6 keeps the div in range).
    *
    * Scale shape: ONE hash aggregate to problem grain — the expensive
    * pass over raw samples runs once; each curve point re-reads the
    * eagerly-checkpointed problem frame (filter + single-row
    * reduction), not the input. The per-problem sample cap rides an
    * in-plan assert (the [[Preference.krippendorffAlphaInterval]]
    * guard pattern): a problem with more than `maxN` samples fails
    * loudly before a product can overflow. Call-time contract:
    * maxN^max(ks) must fit DECIMAL(38,0).
    *
    * Output: one row per k — (k, n_problems, sum_pass_e6,
    * mean_pass_e6) — the sum exact in DECIMAL(38,0), the mean a
    * truncating div (LONG). */
  def passAtKCurve(samples: DataFrame, problem: Column, correct: Column,
      ks: Seq[Int], maxN: Int = 1000): DataFrame = {
    require(ks.nonEmpty && ks.head >= 1 && ks == ks.sorted.distinct,
      s"ks must be sorted distinct positives, got $ks")
    require(ks.max * math.log10(maxN.toDouble) <= 36.0,
      s"maxN=$maxN^k=${ks.max} exceeds DECIMAL(38,0); lower maxN or ks")
    val per = samples
      .select(problem.as("__p"), correct.cast("boolean").as("__c"))
      .where(col("__p").isNotNull && col("__c").isNotNull)
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__c"), 1L).otherwise(0L)).as("__cn"))
      .withColumn("__n", guardLe(col("__n"), maxN.toLong,
        concat(lit(s"passAtKCurve: problem with more than $maxN samples ("),
          col("__n").cast("string"), lit(") — raise maxN or pre-cap"))))
      .truncate(true) // problem grain; scanned once per curve point
    val points = ks.map { k =>
      val fails = col("__n") - col("__cn")
      val num = (0 until k).foldLeft(dec(lit(1)))((acc, i) =>
        (acc * dec(fails - lit(i.toLong))).cast("decimal(38,0)"))
      val den = (0 until k).foldLeft(dec(lit(1)))((acc, i) =>
        (acc * dec(col("__n") - lit(i.toLong))).cast("decimal(38,0)"))
      per.where(col("__n") >= k.toLong)
        .select((col("__n") - col("__cn")).as("__f"),
          num.as("__pk_num"), den.as("__pk_den"))
        .select(when(col("__f") < k.toLong, lit(1000000L))
          .otherwise(lit(1000000L) -
            expr("CAST(__pk_num * 1000000 div __pk_den AS BIGINT)"))
          .as("__pass_e6"))
        .agg(count(lit(1)).as("n_problems"),
          sum(dec(col("__pass_e6"))).as("sum_pass_e6"))
        .select(lit(k).as("k"), col("n_problems"),
          col("sum_pass_e6"),
          expr("""CASE WHEN n_problems = 0 THEN NULL
                 | ELSE CAST(sum_pass_e6 div n_problems AS BIGINT)
                 | END""".stripMargin).as("mean_pass_e6"))
    }
    points.reduce(_ unionByName _)
  }

  /** Unbiased best-of-n reward curve (WebGPT app. I / the standard
    * order-statistics estimator): per prompt with N samples whose
    * rewards sort ascending r_(1) ≤ … ≤ r_(N),
    * E[max of n uniform-without-replacement draws]
    *   = Σ_{i=n}^{N} C(i−1, n−1) · r_(i) / C(N, n),
    * exactly — every subset's max is r_(i) for C(i−1, n−1) of the
    * C(N, n) subsets. Numerator and denominator are exact DECIMAL
    * products (binomials via falling-factorial div factorial, both
    * integer-exact), per-prompt value_e6 = num·1e6 div den.
    *
    * Scale shape: one window partitioned BY PROMPT (rank + count —
    * group-local sort, never global), then per-curve-point hash
    * aggregates to prompt grain and a single-row reduction. The
    * sample-grain windowed frame is persisted across the |ns| curve
    * points and unpersisted after the (tiny) output materializes.
    * In-plan assert caps per-prompt N at `maxN`;
    * C(maxN−1, max(ns)−1)·maxReward must fit DECIMAL(38,0) — with
    * maxN ≤ 64 and n ≤ 8, C(63,7) ≈ 5.5e8, safe for any LONG reward.
    *
    * Ties: `tie` must make (reward, tie) a total order within each
    * prompt; the estimator's VALUE is tie-order invariant (equal
    * rewards swap weights), so any deterministic tiebreak pins the
    * same curve.
    *
    * Output: one row per n — (n, n_prompts, sum_best_e6, mean_best_e6)
    * where value_e6 is the reward in the caller's integer unit × 1e6. */
  def bestOfNCurve(samples: DataFrame, prompt: Column, reward: Column,
      tie: Column, ns: Seq[Int], maxN: Int = 64): DataFrame = {
    require(ns.nonEmpty && ns.head >= 1 && ns == ns.sorted.distinct,
      s"ns must be sorted distinct positives, got $ns")
    require(maxN <= 1000 && ns.max <= 16,
      s"maxN=$maxN, max n=${ns.max} out of contract (N ≤ 1000, n ≤ 16)")
    require((ns.max - 1) * math.log10(maxN.toDouble) <= 30.0,
      "C(maxN-1, n-1) would exceed the DECIMAL(38,0) headroom")
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val w = Window.partitionBy(col("__p"))
    val ranked = samples
      .select(prompt.as("__p"), reward.cast("long").as("__r"), tie.as("__t"))
      .where(col("__p").isNotNull && col("__r").isNotNull)
      .withColumn("__i",
        row_number().over(w.orderBy(col("__r").asc, col("__t").asc)))
      .withColumn("__N", guardLe(count(lit(1)).over(w), maxN.toLong,
        concat(lit(s"bestOfNCurve: prompt with more than $maxN samples ("),
          count(lit(1)).over(w).cast("string"), lit(") — raise maxN"))))
      .persist(mem)
    val points = ns.map { n =>
      // falling factorials: coef = Π_{j=0}^{n−2}(__i−1−j)
      //                   = C(__i−1, n−1)·(n−1)!, and
      // dn = Π_{j=0}^{n−1}(__N−j) = C(__N, n)·n!, so the estimator
      // Σ C(i−1,n−1)·r / C(N,n) = (Σ coef·r)·n / dn — the factorials
      // cancel to a single ×n, keeping everything integer-exact.
      val coef = (0 until n - 1).foldLeft(dec(lit(1)))((acc, j) =>
        (acc * dec(col("__i") - lit((1 + j).toLong))).cast("decimal(38,0)"))
      val dn = (0 until n).foldLeft(dec(lit(1)))((acc, j) =>
        (acc * dec(col("__N") - lit(j.toLong))).cast("decimal(38,0)"))
      ranked.where(col("__N") >= n.toLong && col("__i") >= n.toLong)
        .select(col("__p"),
          (coef * dec(col("__r"))).cast("decimal(38,0)").as("__term"),
          dn.as("__dn"))
        .groupBy(col("__p"))
        .agg(sum(col("__term")).as("__num"), max(col("__dn")).as("__dn"))
        .select(expr(s"CAST(__num * $n * 1000000 div __dn AS BIGINT)")
          .as("__best_e6"))
        .agg(count(lit(1)).as("n_prompts"),
          sum(dec(col("__best_e6"))).as("sum_best_e6"))
        .select(lit(n).as("n"), col("n_prompts"), col("sum_best_e6"),
          expr("""CASE WHEN n_prompts = 0 THEN NULL
                 | ELSE CAST(sum_best_e6 div n_prompts AS BIGINT)
                 | END""".stripMargin).as("mean_best_e6"))
    }
    val out = points.reduce(_ unionByName _).truncate(true)
    ranked.unpersist()
    out
  }

  /** Wilson score lower bound (z = 1.96, the two-sided 95% normal
    * quantile) per item, in exact integers.
    *
    * Relation to [[Profile.wilsonLowerBound]] (q129): that form takes
    * an ARBITRARY z and achieves cross-engine parity through a pinned
    * IEEE double chain; this one fixes z at the rational 49/25 and in
    * exchange eliminates floating point entirely — every intermediate
    * is a DECIMAL(38,0) integer, so the bound is exact by construction
    * rather than by both engines rounding identically. Use Profile's
    * when the caller chooses z; use this one in hash-gated ranking
    * pipelines. With z = 49/25 the bound
    *   lb = (w + z²/2 − z·√(w(n−w)/n + z²/4)) / (n + z²)
    * clears denominators to
    *   lb_e6 = (1250·n·w + 2401·n − 49·isqrt(n·(2500·w·(n−w) + 2401·n)))
    *           · 1e6 div (1250·n² + 4802·n)
    * — every intermediate a DECIMAL(38,0) integer; isqrt is
    * floor(√·) via the corrected double seed (the absolute error of
    * the double round-trip is √x·2⁻⁵⁴ < 1 for every x < 2¹⁰⁶ ≈ 8e31,
    * so the ±1 CASE correction is exact over the whole DECIMAL(38,0)
    * contract — n ≤ 2e9 keeps n·2500·w·(n−w) ≤ 2e37 in range). The
    * floor'd root only ever *lowers* the bound by < 1e-6·(1/n) — it
    * stays a valid (deterministic, oracle-exact) lower bound.
    *
    * Ranking by lb_e6 is the standard fix for naive win-rate sorting:
    * 1/1 (lb 0.207) no longer outranks 90/100 (lb 0.825).
    *
    * Scale shape: one hash aggregate to item grain, then scalar
    * expressions — no window, no join, no collect.
    *
    * Output: (item, wins, trials, wilson_lb_e6). */
  def wilsonLowerBoundE6(samples: DataFrame, item: Column,
      success: Column): DataFrame = {
    val per = samples
      .select(item.as("item"), success.cast("boolean").as("__s"))
      .where(col("item").isNotNull && col("__s").isNotNull)
      .groupBy(col("item"))
      .agg(sum(when(col("__s"), 1L).otherwise(0L)).as("wins"),
        count(lit(1)).as("trials"))
    per
      .withColumn("__vn", (dec(col("trials")) *
        (dec(lit(2500)) * dec(col("wins")) * dec(col("trials") - col("wins"))
          + dec(lit(2401)) * dec(col("trials")))).cast("decimal(38,0)"))
      .withColumn("__s0", expr("CAST(floor(sqrt(CAST(__vn AS DOUBLE))) AS BIGINT)"))
      .withColumn("__rt", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __vn THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __vn
          |   THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .withColumn("wilson_lb_e6", expr(
        """CAST((CAST(1250 AS DECIMAL(38,0)) * trials * wins
          |   + CAST(2401 AS DECIMAL(38,0)) * trials
          |   - CAST(49 AS DECIMAL(38,0)) * __rt) * 1000000
          | div (CAST(1250 AS DECIMAL(38,0)) * trials * trials
          |   + CAST(4802 AS DECIMAL(38,0)) * trials) AS BIGINT)"""
          .stripMargin))
      .select(col("item"), col("wins"), col("trials"), col("wilson_lb_e6"))
  }

  /** Youden-J optimal threshold table (Youden 1950) over a
    * bounded-domain integer score — the "where do we actually cut"
    * companion to the q171 AUC: per candidate threshold t (classify
    * positive when score ≥ t),
    *
    *   tpr_e6 = tp·1e6 div P,  fpr_e6 = fp·1e6 div N,
    *   j_e6 = tpr_e6 − fpr_e6
    *
    * with `is_best` marking the J-maximizing threshold (ties → LOWER
    * threshold, pinned — the more sensitive cut). Exact integers; the
    * cumulative tp/fp come from descending windows over the score
    * census ([[Census.guardLong]]-guarded bounded-domain contract,
    * same as every ROC-census operator here).
    *
    * Scale shape: ONE hash aggregate to the score census; windows and
    * the argmax run census-side. */
  def youdenTableE6(df: DataFrame, score: Column,
      positive: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = df.select(score.cast("long").as("t"),
        positive.cast("boolean").as("p"))
      .where(col("t").isNotNull && col("p").isNotNull)
      .groupBy(col("t"))
      .agg(sum(when(col("p"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("p"), 1L).otherwise(0L)).as("nn"))
    val wGe = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("t"))).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    census
      .withColumn("tp", Census.guardLong(sum(col("np")).over(wGe),
        count(lit(1)).over(whole), "EvalCurves.youdenTableE6"))
      .withColumn("fp", sum(col("nn")).over(wGe))
      .withColumn("__P", sum(col("np")).over(whole))
      .withColumn("__N", sum(col("nn")).over(whole))
      .where(col("__P") > 0L && col("__N") > 0L)
      .withColumn("tpr_e6", expr("tp * 1000000 div __P"))
      .withColumn("fpr_e6", expr("fp * 1000000 div __N"))
      .withColumn("j_e6", col("tpr_e6") - col("fpr_e6"))
      .withColumn("__b",
        min(struct((-col("j_e6")).as("nj"), col("t"))).over(whole))
      .select(col("t"), col("tp"), col("fp"), col("tpr_e6"),
        col("fpr_e6"), col("j_e6"),
        (col("j_e6") === -col("__b.nj") && col("t") === col("__b.t"))
          .as("is_best"))
  }
}
