package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two samples of one metric — the
  * Population Stability Index report every production feature pipeline
  * runs between a reference window (training corpus, last week) and a
  * target window (serving traffic, this week).
  *
  * PSI = Σ_bins (p_t − p_r)·ln(p_t / p_r), over bins derived from the
  * REFERENCE distribution's exact equi-depth cuts
  * ([[ExactQuantiles.equiDepthCuts]] — no global sort), so a stationary
  * target scores ≈ 0 by construction and the per-bin terms localize
  * WHERE the mass moved. Industry reading: < 0.1 stable, 0.1–0.25 drift
  * worth a look, > 0.25 action.
  *
  * Determinism discipline: bin assignment is the integer collapse-left
  * fold; each bin's term follows ONE pinned double pipeline
  * (p = n/N as a double divide, floored at 1e-6 — the standard
  * zero-count guard — then (p_t−p_r)·ln(p_t/p_r)) and rounds to integer
  * micro-units BEFORE any summation (the no-raw-double-SUM rule), so the
  * report hash-gates cross-engine.
  *
  * Cost: the reference quantile scans + one counting aggregation per
  * side (map-side combine, `buckets` groups out) + a buckets-row join.
  * Nothing corpus-sized shuffles. Output: (bucket, n_ref, n_tgt,
  * psi_term_e6) — callers sum psi_term_e6 for the headline number. */
object Drift {

  def psiBins(ref: DataFrame, target: DataFrame, value: Column,
      rowKey: Column, buckets: Int, k: Int = 4096): DataFrame = {
    val cuts = ExactQuantiles.equiDepthCuts(ref, value, rowKey, buckets, k)
    val bin = ExactQuantiles.binColumn(cuts, value)
    def counts(df: DataFrame, as: String) = df.select(bin.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val nr = ref.count()
    val nt = target.count()
    require(nr > 0 && nt > 0, "both samples must be non-empty")
    val joined = counts(ref, "n_ref")
      .join(counts(target, "n_tgt"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"))
    // pinned double pipeline, mirrored in the oracle SQL
    val pr = greatest(col("n_ref").cast("double") / lit(nr.toDouble), lit(1e-6))
    val pt = greatest(col("n_tgt").cast("double") / lit(nt.toDouble), lit(1e-6))
    joined.select(col("bucket"), col("n_ref"), col("n_tgt"),
      round((pt - pr) * log(pt / pr) * lit(1000000.0)).cast("long")
        .as("psi_term_e6"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the unbinned
    * companion to [[psiBins]]: D = max_v |F_ref(v) − F_tgt(v)|, decided
    * entirely in integers by cross-multiplication
    * (D·n_ref·n_tgt = max |cum_ref·n_tgt − cum_tgt·n_ref|), so the
    * answer is exact at any scale — no bin choice, no float CDFs. The
    * significance threshold c(α)·√((n1+n2)/n1n2) stays caller-side.
    *
    * Shape: per-side value HISTOGRAMS (the only full-data passes,
    * map-side combined), a full-outer merge on value, two cumulative
    * windows over the |distinct values|-row frame, and a (d desc, value)
    * argmax — a total order, so the witness value is deterministic.
    * Output: one row (n_ref, n_tgt, d_num, at_value) with
    * D = d_num / (n_ref·n_tgt). */
  def ksStatistic(ref: DataFrame, target: DataFrame,
      value: Column): DataFrame = {
    def hist(df: DataFrame, as: String) =
      df.select(value.cast("long").as("v")).where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(as))
    val merged = hist(ref, "cr").join(hist(target, "ct"), Seq("v"),
        "full_outer")
      .select(col("v"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val byV = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v")))
    merged
      .withColumn("cum_r", Census.guardLong(sum(col("cr")).over(byV),
        count(lit(1)).over(all), "Drift.ksStatistic"))
      .withColumn("cum_t", sum(col("ct")).over(byV))
      .withColumn("n_ref", sum(col("cr")).over(all))
      .withColumn("n_tgt", sum(col("ct")).over(all))
      .withColumn("d",
        abs(col("cum_r") * col("n_tgt") - col("cum_t") * col("n_ref")))
      .groupBy(col("n_ref"), col("n_tgt"))
      .agg(max(struct(col("d"), (-col("v")).as("nv"))).as("k"))
      .select(col("n_ref"), col("n_tgt"), col("k.d").as("d_num"),
        (-col("k.nv")).as("at_value"))
  }

  /** Exact change-point finder — WHERE did the distribution shift, not
    * just whether: over every candidate time-bucket boundary t, the
    * two-sample KS numerator between {rows before t} and {rows at/after
    * t}, maximized. Pure integers end to end (the [[ksStatistic]]
    * cross-multiplication per split), argmax totalized by
    * (d desc, t asc, v asc).
    *
    * Shape discipline: the raw rows collapse ONCE to a (bucket, value)
    * census; everything after runs on the |buckets| × |distinct values|
    * grid — per-split before-counts from a bounded boundary×census
    * equi-join (each census cell meets ≤ |buckets| boundaries, and
    * |buckets| is a calendar, not data, scale), per-split CDFs from one
    * window per grid partition. A 100 TB input still yields a
    * days×values grid. Output: one row (split_bucket, n_before,
    * n_after, d_num, at_value) with D = d_num/(n_before·n_after). */
  def changePoint(df: DataFrame, bucket: Column, value: Column): DataFrame = {
    val census = df.select(bucket.cast("long").as("day"),
        value.cast("long").as("v"))
      .where(col("day").isNotNull && col("v").isNotNull)
      .groupBy(col("day"), col("v")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minDay = census.agg(min(col("day"))).head().getLong(0)
    val bounds = census.select(col("day").as("t")).distinct()
      .where(col("t") > minDay)
    val vals = census.select(col("v")).distinct()
    // global per-value totals and value-CDF (shared across splits)
    val byV = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val allW = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("v")))
    val tot = census.groupBy(col("v")).agg(sum(col("n")).as("cnt"))
      .withColumn("cumT", sum(col("cnt")).over(byV))
      .withColumn("nTotal", sum(col("cnt")).over(allW))
      .select(col("v"), col("cumT"), col("nTotal"))
    // per-split before-counts: census cells meet only LATER boundaries
    val cb = broadcast(bounds).join(census, col("day") < col("t"))
      .groupBy(col("t"), col("v")).agg(sum(col("n")).as("nb"))
    val grid = broadcast(bounds).crossJoin(vals)
      .join(cb, Seq("t", "v"), "left")
      .select(col("t"), col("v"), coalesce(col("nb"), lit(0L)).as("nb"))
    val byVperT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perT = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
    val scored = grid
      .withColumn("cumB", sum(col("nb")).over(byVperT))
      // cumB is monotone in v, so the per-split total is its max
      .withColumn("nB", max(col("cumB")).over(perT))
      .join(broadcast(tot), "v")
      .withColumn("d", abs(col("cumB") * (col("nTotal") - col("nB")) -
        (col("cumT") - col("cumB")) * col("nB")))
    // census stays persisted until the caller's clearCache — an eager
    // unpersist here would run at plan-build time, before execution
    val top = scored
      .select(col("t"), col("v"), col("d"), col("nB"), col("nTotal"))
      .orderBy(col("d").desc, col("t"), col("v")).limit(1)
    top.select(col("t").as("split_bucket"), col("nB").as("n_before"),
      (col("nTotal") - col("nB")).as("n_after"), col("d").as("d_num"),
      col("v").as("at_value"))
  }

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975) per series — the
    * nonparametric "is this metric drifting monotonically" gate used on
    * daily KPIs, where seasonality and outliers disqualify OLS-on-time:
    *   S = Σ_{i<j} sign(x_j − x_i)
    * with the tie-corrected variance (Kendall §4) kept as the exact
    * integer numerator of 18·Var:
    *   var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5).
    * Two-sided normal test at |Z| > zCritE6/1e6 with continuity
    * correction, decided WITHOUT sqrt or floats by cross-multiplying:
    *   Z² > z²  ⇔  (|S|−1)² · 18 · 1e12 > zCritE6² · var18
    * (S = 0 is never significant). Output per series: n, s_stat, var18,
    * and trend ∈ {increasing, decreasing, none}.
    *
    * Scale shape: the input is a per-(series, bucket) aggregate — a
    * calendar×series grid, NOT raw rows — so the i<j self-join is
    * bounded at (days²)/2 per series regardless of input volume; ties
    * census is one more tiny aggregate over the same grid. This is the
    * standard two-stage shape: 100 TB collapses to the grid first, the
    * quadratic statistic runs on the grid. */
  def mannKendall(series: DataFrame, seriesCol: String, bucketCol: String,
      valueCol: String, zCritE6: Long = 1959964L): DataFrame = {
    val g = series.select(col(seriesCol).as("s"),
        col(bucketCol).cast("long").as("t"),
        col(valueCol).cast("long").as("x"))
      .where(col("t").isNotNull && col("x").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = g.select(col("s"), col("t").as("ti"), col("x").as("xi"))
      .join(g.select(col("s"), col("t").as("tj"), col("x").as("xj")), Seq("s"))
      .where(col("ti") < col("tj"))
      .groupBy(col("s"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
    val ties = g.groupBy(col("s"), col("x")).agg(count(lit(1)).as("tt"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("tt")).as("n"),
        sum(col("tt") * (col("tt") - 1) * (col("tt") * 2 + 5)).as("tie18"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    pairs.join(ties, "s")
      .withColumn("var18",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie18"))
      .withColumn("__sig",
        col("s_stat") =!= 0L &&
          d((abs(col("s_stat")) - 1) * (abs(col("s_stat")) - 1)) *
            d(lit(18L)) * d(lit(1000000000000L)) >
            d(lit(zCritE6)) * d(lit(zCritE6)) * d(col("var18")))
      .select(col("s").as(seriesCol), col("n"), col("s_stat"), col("var18"),
        when(!col("__sig"), "none")
          .when(col("s_stat") > 0, "increasing")
          .otherwise("decreasing").as("trend"))
  }

  /** Jensen–Shannon divergence of each group's value distribution
    * against the pooled corpus distribution — the source-similarity
    * table data-mixture planning reads (a source with JSD ≈ ln 2 is
    * alien to the mix; ≈ 0 is redundant with it).
    *
    * Computed in the entropy form JSD(P,Q) = H((P+Q)/2) − (H(P)+H(Q))/2,
    * which needs only PRESENT (group, value) census cells: the part of
    * H(M) contributed by values ABSENT from the group is exactly the
    * corpus term −(q/2)·ln(q/2) for those values, so
    * H(M)_g = Σ_present t_m + (TQ − Σ_present t_q) with TQ the
    * corpus-wide Σ −(q/2)·ln(q/2) — one broadcast scalar, no
    * group × vocabulary cross join ever materializes.
    *
    * Determinism discipline (q357's): every per-cell term is ONE pinned
    * double pipeline — p as a double divide, −p·ln(p)·1e6, rounded to
    * integer micro-nats BEFORE summation — and the halving of
    * (H(P)+H(Q)) is a truncating integer div. Up to that documented
    * per-term truncation the classical identity holds, and the output
    * hash-gates cross-engine. Degenerate one-value groups get H(P) = 0
    * naturally; jsd_e6 is clamped at 0 against ±1-micro-nat rounding
    * drift so redundancy reads as exactly 0, never −0.000001.
    *
    * Shape: one hash aggregate to (group, value) census grain — the
    * only raw-data pass; the corpus census re-aggregates the group
    * census; totals ride broadcast one-row frames. Persisted censuses
    * live until the caller's clearCache (the collocations contract). */
  def jsDivergenceE6(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val cells = df.select(groupCol.as("g"), valueCol.as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = cells.groupBy(col("v")).agg(sum(col("c")).as("cc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ng = cells.groupBy(col("g")).agg(sum(col("c")).as("ng"))
    val nTotal = broadcast(corpus.agg(
      coalesce(sum(col("cc")), lit(0L)).as("n")))
    // corpus-level scalars: TQ = Σ −(q/2)ln(q/2), HQ = Σ −q·ln(q)
    val corpusTerms = corpus.crossJoin(nTotal)
      .select(
        round(-(col("cc").cast("double") / col("n").cast("double") / lit(2.0)) *
          log(col("cc").cast("double") / col("n").cast("double") / lit(2.0)) *
          lit(1000000.0)).cast("long").as("tq"),
        round(-(col("cc").cast("double") / col("n").cast("double")) *
          log(col("cc").cast("double") / col("n").cast("double")) *
          lit(1000000.0)).cast("long").as("thq"))
      .agg(sum(dec(col("tq"))).cast("decimal(38,0)").as("__tq"),
        sum(dec(col("thq"))).cast("decimal(38,0)").as("__hq"))
    val perCell = cells
      .join(ng, "g")
      .join(corpus, "v")
      .crossJoin(nTotal)
      .select(col("g"),
        // m = (p + q)/2, one pinned chain
        round(-((col("c").cast("double") / col("ng").cast("double") +
            col("cc").cast("double") / col("n").cast("double")) / lit(2.0)) *
          log((col("c").cast("double") / col("ng").cast("double") +
            col("cc").cast("double") / col("n").cast("double")) / lit(2.0)) *
          lit(1000000.0)).cast("long").as("tm"),
        round(-(col("cc").cast("double") / col("n").cast("double") / lit(2.0)) *
          log(col("cc").cast("double") / col("n").cast("double") / lit(2.0)) *
          lit(1000000.0)).cast("long").as("tq"),
        round(-(col("c").cast("double") / col("ng").cast("double")) *
          log(col("c").cast("double") / col("ng").cast("double")) *
          lit(1000000.0)).cast("long").as("tp"))
    perCell.groupBy(col("g"))
      .agg(count(lit(1)).as("n_values"),
        sum(dec(col("tm"))).cast("decimal(38,0)").as("__sm"),
        sum(dec(col("tq"))).cast("decimal(38,0)").as("__sq"),
        sum(dec(col("tp"))).cast("decimal(38,0)").as("__hp"))
      .join(ng, "g")
      .crossJoin(broadcast(corpusTerms))
      .select(col("g").as("group"), col("n_values"),
        col("ng").as("n_tokens"),
        expr("""CAST(greatest(CAST(0 AS DECIMAL(38,0)),
               |  __sm + (__tq - __sq)
               |   - (__hp + __hq) div 2) AS BIGINT)""".stripMargin)
          .as("jsd_e6"))
  }

  private def dec(c: Column): Column = c.cast("decimal(38,0)")
}
