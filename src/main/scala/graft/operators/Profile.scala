package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** One-pass data profiling (the Deequ/Great-Expectations shape): per-column
  * row/null/distinct counts and min/max over an arbitrary column list,
  * computed in a SINGLE scan — the pre-ingest census every pipeline runs
  * before trusting a new drop of data.
  *
  * Shape: TWO passes regardless of column count. Pass 1 computes every
  * null count and typed min/max in one plain hash aggregate (one row,
  * unpivoted with a literal `stack`). Pass 2 computes every distinct
  * count by exploding each row into (column, rendered value) pairs and
  * double-aggregating — the map-side partial collapse means the exchange
  * carries ~|distinct values| rows per column, and the rendering is used
  * only for IDENTITY (injective for integral/text types), never for
  * ordering. A single `agg` with k `countDistinct`s reads nicer but
  * Catalyst plans the multi-distinct rewrite as a SET-buffered
  * SortAggregate over the k×-expanded scan — measured 13 s vs 2 s on 600k
  * rows — so the two-pass form is the scale-shaped one.
  *
  * min/max are rendered as strings so heterogeneous column types share a
  * schema — but only AFTER the typed aggregation, so numeric ordering is
  * correct; longs and strings render identically across engines (doubles
  * and timestamps have engine-specific text forms — callers gating
  * cross-engine should profile integral/text columns, as q79 does).
  */
object Profile {

  /** Per-column stats rows: (column, n_rows, n_null, n_distinct,
    * min_value, max_value) in `cols` order. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    // pass 1: nulls + typed min/max + row count in one hash aggregate
    val aggs = cols.flatMap { c =>
      Seq(
        // sum over ZERO rows is NULL, not 0 — coalesce so an empty
        // table profiles as all-zero counts
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"null_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `null_$c`, `min_$c`, `max_$c`"
    ).mkString(", ")
    val scalar = one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_null, min_value, max_value)"))
    // pass 2: distinct counts via (column, value) pairs, collapsed
    // map-side; NULL values drop (countDistinct semantics)
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.column").as("column"), col("p.v").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("column"), col("v")).agg(count(lit(1)))
      .groupBy(col("column")).agg(count(lit(1)).as("n_distinct"))
    scalar.join(pairs, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }

  /** Declarative data-quality checks (the Deequ constraint suite shape):
    * each check reduces to ONE aggregate-able violation count, evaluated
    * in a single pass per source frame, emitted as
    * (check_name, violations, passed) rows — the contract gate a pipeline
    * runs before publishing a snapshot.
    *
    *  - `completeness`: null count of a column must be 0;
    *  - `uniqueness`: duplicate-key rows (n − distinct) must be 0;
    *  - `referential`: child keys absent from the parent must be 0 —
    *    a left-anti join, which Catalyst runs broadcast when the parent
    *    key set is small and shuffled otherwise.
    *
    * All violation counts are exact longs; `passed` is their == 0. */
  def checks(df: DataFrame,
      completeness: Seq[String] = Nil,
      uniqueness: Seq[String] = Nil,
      referential: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(completeness.nonEmpty || uniqueness.nonEmpty || referential.nonEmpty)
    val inlineDefs: Seq[(String, org.apache.spark.sql.Column)] =
      completeness.map(c => s"complete:$c" ->
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))) ++
      uniqueness.map(c => s"unique:$c" ->
        (count(col(c)) - countDistinct(col(c))))
    val inline: Seq[DataFrame] =
      if (inlineDefs.isEmpty) Nil
      else {
        // one scan for every inline check; stack unpivots the single row
        val aggs = inlineDefs.zipWithIndex.map { case ((_, c), i) => c.as(s"v$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = inlineDefs.zipWithIndex
          .map { case ((n, _), i) => s"'$n', v$i" }.mkString(", ")
        Seq(one.select(expr(
          s"stack(${inlineDefs.size}, $stackArgs) AS (check_name, violations)")))
      }
    val refs = referential.map { case (childKey, parent, parentKey) =>
      df.select(col(childKey)).where(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"ref:$childKey->$parentKey").as("check_name"),
          col("violations"))
    }
    (inline ++ refs).reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
  }

  /** Exact second-moment profile per group for an integer (x, y) pair —
    * the sufficient statistics of variance, covariance, and Pearson
    * correlation, kept as BIGINTs so they hash-gate and MERGE across
    * partitions/shards by plain addition (the "sufficient statistics,
    * not statistics" discipline every distributed stats layer uses):
    *
    *   var_x·n²  = n·Σx² − (Σx)²   (returned as var_x_num)
    *   cov·n²    = n·Σxy − Σx·Σy   (returned as corr_num — Pearson's
    *                                numerator; the caller divides by
    *                                √(var_x_num·var_y_num) when a float
    *                                is finally wanted)
    *
    * ONE scan, map-side partial aggregation, `groups` rows out. Inputs
    * must be pre-scaled fixed-point (cents etc.); with |x|,|y| ≤ 10⁶ and
    * n ≤ 10⁹ the products stay inside int64 — callers at larger scale
    * drop to the e3 scale, not to doubles. */
  /** Per-group pass-rate with a Wilson-score LOWER confidence bound
    * (Wilson 1927; the Agresti–Coull-recommended interval; see
    * [[EvalCurves.wilsonLowerBoundE6]] for the z = 1.96-only sibling
    * that trades the arbitrary-z parameter for fully integer-exact
    * arithmetic) — the
    * statistically honest quality gate: a source passing 9/10 docs and
    * one passing 900/1000 share p̂ = 0.9 but NOT the same evidence; the
    * Wilson bound separates them, and gating on the bound instead of the
    * point rate stops small samples from sneaking through.
    *
    * Determinism: one pinned double chain (IEEE +,·,/ and sqrt — sqrt is
    * correctly rounded by both engines, so parity is exact)
    *   lb = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    * rounded to e6 — the oracle mirrors the expression tree literally.
    * ONE counting aggregation (map-side combine), `groups` rows out.
    * Output: (groupCol, n, n_pass, wilson_lb_e6). */
  def wilsonLowerBound(df: DataFrame, groupCol: String, pass: Column,
      z: Double = 1.96): DataFrame = {
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(pass, 1L).otherwise(0L)), lit(0L)).as("n_pass"))
    val n = col("n").cast("double")
    val p = col("n_pass").cast("double") / n
    val z2 = lit(z * z)
    val lb = (p + z2 / (lit(2.0) * n) -
      lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))) /
      (lit(1.0) + z2 / n)
    agged.select(col(groupCol), col("n"), col("n_pass"),
      round(lb * lit(1000000.0)).cast("long").as("wilson_lb_e6"))
  }

  /** EXACT ROC AUC (rank form, midrank tie handling) — the classifier
    * evaluation that usually gets approximated by threshold sweeps:
    * AUC = (ΣR₊ − n₊(n₊+1)/2) / (n₊n₋) with tied scores taking midranks.
    * Doubling keeps midranks integral, so the whole statistic is an
    * exact integer RATIO (auc_num / auc_den, auc_den = 2n₊n₋) — no
    * float ranks, no sort of the raw data: per-score histogram cells
    * (the only full pass, map-side combined) feed a cumulative window
    * over |distinct scores| rows, and each cell contributes
    * pos·(2·cum_before + cnt + 1) to 2ΣR₊ in closed form.
    * Output: one row (n_pos, n_neg, auc_num, auc_den). */
  def exactAuc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val h = df.select(score.cast("long").as("s"),
        when(positive, 1L).otherwise(0L).as("p"))
      .where(col("s").isNotNull)
      .groupBy(col("s")).agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
    val byS = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("s"))).orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("s")))
    h
      .withColumn("cum", sum(col("cnt")).over(byS))
      .withColumn("n", sum(col("cnt")).over(all))
      .withColumn("n_pos", sum(col("pos")).over(all))
      .withColumn("term", col("pos") *
        (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L)))
      .groupBy(col("n"), col("n_pos"))
      .agg(sum(col("term")).as("sum2r"))
      .select(col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        (col("sum2r") - col("n_pos") * (col("n_pos") + 1L)).as("auc_num"),
        (lit(2L) * col("n_pos") * (col("n") - col("n_pos"))).as("auc_den"))
  }

  /** Cohen's κ — chance-corrected agreement between two deterministic
    * raters (multi-category): κ = (p_o − p_e)/(1 − p_e) with p_o the
    * observed agreement and p_e the marginal-product chance agreement.
    * Emitted as the exact integer ratio
    *   kappa_num = n·n_agree − Σ_c row_c·col_c,
    *   kappa_den = n²        − Σ_c row_c·col_c
    * (DECIMAL(38,0): n² leaves LONG near n ≈ 3·10⁹).
    *
    * Shape: ONE full pass into a k² confusion census (map-side
    * combined, persisted — it feeds the marginal, agreement, and total
    * reductions), then k-row frames only. Output: one row
    * (n, n_agree, pe_num, kappa_num, kappa_den). */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val census = df
      .select(raterA.cast("long").as("a"), raterB.cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val pe = census.groupBy(col("a").as("cat"))
      .agg(sum(col("cnt")).as("row_n"))
      .join(census.groupBy(col("b").as("cat"))
        .agg(sum(col("cnt")).as("col_n")), "cat")
      .agg(coalesce(sum(d(col("row_n")) * d(col("col_n"))),
        lit(0).cast("decimal(38,0)")).as("pe_num"))
    census
      .agg(sum(col("cnt")).as("n"),
        coalesce(sum(when(col("a") === col("b"), col("cnt"))), lit(0L))
          .as("n_agree"))
      .crossJoin(pe)
      .select(col("n"), col("n_agree"), col("pe_num"),
        (d(col("n")) * d(col("n_agree")) - col("pe_num")).as("kappa_num"),
        (d(col("n")) * d(col("n")) - col("pe_num")).as("kappa_den"))
  }

  def momentProfile(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame =
    df.select(col(groupCol), x.cast("long").as("__x"), y.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"), sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(col("__y") * col("__y")).as("sum_yy"),
        sum(col("__x") * col("__y")).as("sum_xy"))
      .select(col(groupCol), col("n"), col("sum_x"), col("sum_y"),
        col("sum_xx"), col("sum_yy"), col("sum_xy"),
        (col("n") * col("sum_xx") - col("sum_x") * col("sum_x"))
          .as("var_x_num"),
        (col("n") * col("sum_yy") - col("sum_y") * col("sum_y"))
          .as("var_y_num"),
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y"))
          .as("corr_num"))

  /** Inter-event gap histogram — the arrival-cadence profile that tunes
    * session gaps, watermark slack, and state TTLs: per key, the gap to
    * the previous event (one window sort per key partition), bucketed
    * by `bucketMs` with a cap bucket for the tail. Output per
    * (group, bucket): n + exact min/max gap. The histogram is the only
    * thing shuffled twice; both aggregations are census-sized. */
  def gapHistogram(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, groupCol: String, bucketMs: Long,
      maxBucket: Long): DataFrame = {
    require(bucketMs > 0 && maxBucket > 0)
    // the tie column totalizes the per-key order: equal timestamps would
    // otherwise assign gaps to rows nondeterministically (gap VALUES are
    // tie-invariant; which group row carries each gap is not)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__ts"), col(tieCol))
    df.select(col(keyCol), col(groupCol), col(tieCol),
        col(tsCol).cast("long").as("__ts"))
      .withColumn("__gap", col("__ts") - lag(col("__ts"), 1).over(w))
      .where(col("__gap").isNotNull)
      .withColumn("bucket",
        least(expr(s"__gap div ${bucketMs}L"), lit(maxBucket)))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__gap")).as("min_gap_ms"),
        max(col("__gap")).as("max_gap_ms"))
  }

  /** Exact percentile-rank normalization in ppm — the curriculum/
    * mixture input "where does this score sit in the corpus": standard
    * percent_rank ((rank − 1)/(n − 1), ppm-floored) computed WITHOUT
    * sorting the rows — a value census + one cumulative window over
    * |distinct values| cells, broadcast back onto the rows. Output:
    * input id column + value + pct_ppm (single-row input pins 0). */
  def percentRankPpm(df: DataFrame, idCol: String,
      value: Column): DataFrame = {
    val v = df.select(col(idCol), value.cast("long").as("v"))
    val census = v.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val byV = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v")))
    val ranked = census
      .withColumn("below", coalesce(sum(col("cnt")).over(byV), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(all))
      .select(col("v"), col("below"), col("n"))
    v.join(broadcast(ranked), "v")
      .select(col(idCol), col("v").as("value"),
        when(col("n") > 1, expr("below * 1000000 div (n - 1)"))
          .otherwise(lit(0L)).as("pct_ppm"))
  }

  /** Two-proportion test (the A/B readout) as an exact integer
    * chi-square ratio: arms' (n, successes) census → one row with
    * chi² = N·(ad − bc)² / (n₁·n₂·(a+c)·(b+d)) emitted as
    * (chi2_num, chi2_den) — unreduced, so the readout hash-gates.
    * Output: (n_a, x_a, n_b, x_b, chi2_num, chi2_den); den = 0 marks a
    * degenerate table (all success or all failure). 64-bit headroom:
    * |ad − bc| ≤ n₁·n₂, so keep N below ~55k per test cell at this
    * precision — shard wider populations into strata and combine, or
    * move to DECIMAL(38) sums. */
  def twoProportionChi2(df: DataFrame, arm: Column,
      success: Column): DataFrame = {
    val c = df.select(when(arm, 1L).otherwise(0L).as("g"),
        when(success, 1L).otherwise(0L).as("s"))
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("g") === 0, col("s")).otherwise(0L)).as("x_a"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g") === 1, col("s")).otherwise(0L)).as("x_b"))
    c.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      expr("""(n_a + n_b) *
        (x_a * (n_b - x_b) - x_b * (n_a - x_a)) *
        (x_a * (n_b - x_b) - x_b * (n_a - x_a))""").as("chi2_num"),
      expr("n_a * n_b * (x_a + x_b) * ((n_a - x_a) + (n_b - x_b))")
        .as("chi2_den"))
  }

  /** Gini concentration per group as an exact integer ratio — the "does
    * 1% of users drive 90% of revenue" skew readout (also the heavy-key
    * early warning for join/agg skew): units aggregate first, then one
    * rank window per group over the UNIT census (|units| ≪ |rows|) and
    * the closed form over ascending-sorted values
    *   G = (2·Σi·yᵢ − (n+1)·Σy) / (n·Σy)
    * emitted unreduced. Ties totalize on (y, unit). Output: (group, n,
    * sum_val, gini_num, gini_den); den = 0 marks an empty-revenue
    * group. */
  def giniConcentration(df: DataFrame, groupCol: String, unitCol: String,
      value: Column): DataFrame = {
    val perUnit = df.select(col(groupCol), col(unitCol).as("__u"),
        value.cast("long").as("__y"))
      .groupBy(col(groupCol), col("__u")).agg(sum(col("__y")).as("__y"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__y"), col("__u"))
    perUnit
      .withColumn("__i", row_number().over(rank).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("sum_val"),
        sum(col("__i") * col("__y")).as("__siy"))
      .select(col(groupCol), col("n"), col("sum_val"),
        (lit(2L) * col("__siy") - (col("n") + 1L) * col("sum_val"))
          .as("gini_num"),
        (col("n") * col("sum_val")).as("gini_den"))
  }

  /** Functional-dependency audit (the verification half of FD discovery,
    * Huhtala et al. TANE 1999): for each candidate X→Y, count the X
    * groups, the groups where Y is NOT single-valued (violations), and
    * the worst |distinct Y| within one X group. An exact FD has
    * violating_groups = 0; "approximate FDs" rank by the violation rate.
    *
    * One aggregate per candidate over (X, Y) then per X — both map-side
    * combined, shuffles carry distinct (X,Y) pairs only — unioned into
    * one result. NULL Y counts as a distinct value (a NULL among
    * non-NULLs is a real single-valuedness break for downstream use).
    */
  /** ANALYZE-style per-column statistics in ONE input scan — the
    * CBO-statistics collection every warehouse exposes (`ANALYZE TABLE
    * … COMPUTE STATISTICS FOR COLUMNS`): row count, null count, exact
    * NDV, min and max (stringified for type-generality) per column.
    *
    * Plan shape: a single wide aggregate row (count + per-column
    * null-sum/count_distinct/min/max); the multiple DISTINCT aggregates
    * make Catalyst plan one Expand over the scan — still ONE pass over
    * the data, widened |cols|× in flight, which is the exact-NDV price.
    * At corpus scale pass `exact = false` to swap in
    * approx_count_distinct (HLL++, no Expand) — same output schema,
    * ndv becomes an estimate. The wide row is eagerly checkpointed
    * before the stack() unpivot so the scan runs once, not per column.
    *
    * min/max cast to string AT THE AGGREGATE's input (order is still
    * the column's native order — the cast happens after min/max). */
  def columnStats(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "columnStats: need at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*).truncate(true)
    val stackArgs = cols
      .map(c => s"'$c', __nulls_$c, __ndv_$c, __min_$c, __max_$c")
      .mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, ndv, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("min_val"), col("max_val"))
  }

  /** Mutual information between two categoricals, e6-scaled — the
    * feature-selection number (how much knowing x says about y) that
    * [[woeIv]]'s binary IV generalizes to multi-class:
    * MI = Σ_xy p(x,y)·ln(p(x,y)/(p(x)p(y))). One pass to the (x,y)
    * census; margins re-aggregate the census, never the data. Each
    * cell's log-ratio is ONE pinned double pipeline
    * round(ln(n_xy·N/(n_x·n_y))·1e6) on exact integer counts
    * (integer-rounded BEFORE the weighted sum — the Dawid–Skene/BM25
    * rule), so the final sum replays in SQL bit-for-bit.
    * Output: one row (n, cells, mi_num, mi_e6) where mi_num =
    * Σ n_xy·term_e6 (DECIMAL-exact) and mi_e6 = mi_num div N. */
  def mutualInformationE6(df: DataFrame, x: Column, y: Column)
      : DataFrame = {
    val cells = df.select(x.cast("string").as("__x"),
        y.cast("string").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("nxy"))
      .truncate(true) // census grain: margins re-read this
    val nx = cells.groupBy(col("__x")).agg(sum(col("nxy")).as("nx"))
    val ny = cells.groupBy(col("__y")).agg(sum(col("nxy")).as("ny"))
    val nTot = cells.agg(sum(col("nxy")).as("n"))
    cells.join(nx, Seq("__x")).join(ny, Seq("__y"))
      .crossJoin(broadcast(nTot))
      .select(col("n"), col("nxy"), expr(
        """nxy * CAST(round(ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
          |  / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
          | * 1000000.0) AS BIGINT)""".stripMargin).as("__t"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("cells"),
        sum(col("__t").cast("decimal(38,0)")).as("mi_num"))
      .select(col("n"), col("cells"), col("mi_num"),
        expr("CAST(mi_num div n AS BIGINT)").as("mi_e6"))
  }

  /** r×c chi-square and Cramér's V in EXACT integers — no logs, no
    * doubles anywhere: χ² = Σ n_xy²·N/(n_x·n_y) − N, computed with a
    * per-cell truncating div (deterministic; the truncation bias is
    * < cells·1e-6 of a χ² unit), and V = √(χ²/(N·min(r−1,c−1))) via
    * the corrected isqrt on the e12-scaled ratio. Same census shape
    * as [[mutualInformationE6]].
    * Output: one row (n, r, c, chi2_e6, cramers_v_e6). */
  def chiSquareCramersV(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.select(x.cast("string").as("__x"),
        y.cast("string").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("nxy"))
      .truncate(true)
    val nx = cells.groupBy(col("__x")).agg(sum(col("nxy")).as("nx"))
    val ny = cells.groupBy(col("__y")).agg(sum(col("nxy")).as("ny"))
    val nTot = cells.agg(sum(col("nxy")).as("n"),
      count_distinct(col("__x")).as("r"), count_distinct(col("__y")).as("c"))
    cells.join(nx, Seq("__x")).join(ny, Seq("__y"))
      .crossJoin(broadcast(nTot))
      .select(col("n"), col("r"), col("c"), expr(
        """CAST(CAST(nxy AS DECIMAL(38,0)) * nxy * n * 1000000
          | div (CAST(nx AS DECIMAL(38,0)) * ny) AS BIGINT)"""
          .stripMargin).as("__t"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("__t").cast("decimal(38,0)")).as("__s"))
      .select(col("n"), col("r"), col("c"),
        expr("CAST(__s - CAST(n AS DECIMAL(38,0)) * 1000000 AS " +
          "DECIMAL(38,0))").as("chi2_e6"))
      // per-cell truncation can leave a tiny NEGATIVE chi2 on exactly
      // independent variables — clamp before the root, not after
      .withColumn("__vn", expr(
        """greatest(CAST(chi2_e6 * 1000000
          | div (n * least(r - 1, c - 1)) AS DECIMAL(38,0)),
          | CAST(0 AS DECIMAL(38,0)))""".stripMargin))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__vn AS DOUBLE))) AS BIGINT)"))
      .withColumn("cramers_v_e6", expr(
        """CASE WHEN least(r - 1, c - 1) = 0 THEN NULL
          | WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __vn THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __vn
          |   THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .select(col("n"), col("r"), col("c"),
        col("chi2_e6").cast("string").as("chi2_e6"),
        col("cramers_v_e6"))
  }

  def fdAudit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame =
    candidates.map { case (lhs, rhs) =>
      df.select(col(lhs).cast("string").as("__x"),
          coalesce(col(rhs).cast("string"), lit("\u0000NULL")).as("__y"))
        .groupBy(col("__x"))
        .agg(count_distinct(col("__y")).as("__ny"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__ny") > 1, 1L).otherwise(0L))
            .as("violating_groups"),
          max(col("__ny")).as("max_rhs_distinct"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"), col("n_groups"),
          col("violating_groups"), col("max_rhs_distinct"))
    }.reduce(_.unionByName(_))
}
