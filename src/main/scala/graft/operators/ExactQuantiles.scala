package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.BoundedSample
import graft.Checkpoints.TruncateOps

/** EXACT per-group quantiles over a continuous (high-cardinality) BIGINT
  * domain, at O(sample + band) shuffle cost instead of O(distinct).
  *
  * [[graft.operators.CorpusOps.discQuantiles]] (q48) is the right shape
  * when the value domain is small (histogram + cumulative window). On a
  * continuous column — prices, latencies, scores — its GROUP BY value
  * shuffles every distinct value. This operator is the classic
  * sample-then-refine distributed selection (Munro–Paterson 1980 lineage;
  * Spark's own RangePartitioner bounds-sketching is the same idea):
  *
  *  1. ONE scan: per group, `count` + a [[graft.agg.BoundedSampleAgg]]
  *     uniform sample of k values (mergeable bottom-k-by-hash-priority, so
  *     map-side partials combine; deterministic given a row-unique key).
  *     Result: one ≤k-array row per group to the driver — a bounded
  *     action, same posture as Misra–Gries' candidate fetch (q88). This
  *     operator targets the few-groups × huge-rows shape; for many small
  *     groups use the histogram form.
  *  2. driver: for each (group, percent), the target rank is
  *     ceil(n·p/100) in pure integer arithmetic, and the sample's order
  *     statistics around position p·m/100 give a bracket [lo, hi] whose
  *     true ranks almost surely straddle the target (δ = 3√m sample
  *     positions of slack ≈ 3σ of the binomial sample-rank deviation).
  *  3. ONE scan: rows join the broadcast bracket spec; everything ≤ lo
  *     collapses to a single 'below' counter per (group, percent),
  *     everything > hi is dropped, and only the band (lo, hi] — expected
  *     ≈ 2δ/m of the rows — reaches the shuffle keyed by value. A
  *     cumulative window over the tiny band frame then picks the smallest
  *     value whose exact rank reaches the target.
  *  4. the bracket is VERIFIED from the same output (rank(lo) < target ≤
  *     rank(hi)); a miss (probability ~2e-3 per quantile) widens δ and
  *     repeats — the loop is driver-side, bounded, and converges to the
  *     degenerate full-range bracket which is plainly exact.
  *
  * The sample's randomness never reaches the output: any bracket that
  * passes verification yields the same unique exact quantile, so results
  * are bit-deterministic (plain ORDER BY rank semantics) under every
  * partitioning, merge order, and AQE re-plan.
  */
object ExactQuantiles {

  /** Exact discrete quantiles: for each group and percent p, the smallest
    * value v with |{rows: value ≤ v}| ≥ ceil(n·p/100).
    *
    * BEHAVIOR CHANGE (round 11): the call now FAILS LOUDLY with
    * `IllegalArgumentException` when the grouping exceeds `maxGroups`
    * (default 10000) instead of attempting the driver fetch — callers
    * that previously completed on >10k groups by silently risking a
    * driver OOM must now either pass an explicit larger bound (accepting
    * the ~k·8-byte-per-group driver footprint) or move to the
    * histogram-census form ([[CorpusOps.discQuantiles]]) / a mergeable
    * sketch, which is the right shape for high-cardinality groupings.
    *
    * @param df        input frame
    * @param groupCols grouping columns (few groups; see scaladoc)
    * @param value     BIGINT value column (fixed-point for money)
    * @param rowKey    row-unique key column (drives the deterministic
    *                  sample priorities via seed-0 xxhash64)
    * @param percents  percentiles in (0, 100]
    * @param k         sample size per group (default 4096)
    * @param maxGroups cardinality guard on the pass-1 driver fetch (one
    *                  row of ≤ k longs per group, ~32 KiB at the default
    *                  k): above this the call fails loudly instead of
    *                  silently OOMing the driver — high-cardinality
    *                  groupings belong on a mergeable sketch instead
    * Output: groupCols ++ (percent BIGINT, quantile BIGINT).
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], value: Column,
      rowKey: Column, percents: Seq[Int], k: Int = 4096,
      plusOne: Boolean = false, maxGroups: Int = 10000): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents=$percents out of (0, 100]")
    val spark = df.sparkSession
    BoundedSample.register(spark)
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val prio = graft.functions.GraftFunctions
      .xxhash64Seed0(rowKey.cast("string"))
    val base = df
      .select(groupCols.map(col) :+ value.cast("long").as("__v")
        :+ prio.as("__p"): _*)
      .where(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Pass 1: per-group n + sorted k-sample. Bounded driver fetch:
      // the limit() bounds the fetch ITSELF to maxGroups+1 rows, so an
      // unexpectedly-high-cardinality grouping fails at the require
      // below rather than OOMing the driver mid-collect.
      val sampled = base.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          BoundedSample.boundedSample(col("__v"), col("__p"), k).as("__s"))
        .limit(maxGroups + 1)
        .collect()
      require(sampled.length <= maxGroups,
        s"quantiles: grouping exceeds maxGroups=$maxGroups groups; " +
          "use a mergeable quantile sketch for high-cardinality keys " +
          "or raise maxGroups explicitly")

      var delta = math.max(3, math.ceil(3 * math.sqrt(k)).toInt)
      var result: Option[DataFrame] = None
      while (result.isEmpty) {
        // Bracket spec: one row per (group, percent).
        val spec = sampled.toSeq.flatMap { r =>
          val gs = groupCols.indices.map(r.get)
          val n = r.getLong(groupCols.length)
          val s = r.getSeq[Long](groupCols.length + 1)
          val m = s.length
          percents.map { p =>
            // ceil(n·p/100), or the finite-sample conformal rank
            // ceil((n+1)·p/100) capped at n (split-conformal's q̂ index;
            // the cap is the degenerate small-group max, documented at
            // the [[Conformal]] call site)
            val target =
              if (plusOne) math.min(n, ((n + 1) * p + 99L) / 100L)
              else (n * p + 99L) / 100L
            val pos = if (m == 0) 0 else ((m.toLong * p) / 100L).toInt
            val loI = pos - delta
            val hiI = pos + delta
            // Positions off either end degrade to an open bound — the
            // fully-open bracket is the plain exact computation.
            val lo = if (m == 0 || loI < 0) Long.MinValue
                     else s(math.min(loI, m - 1))
            val hi = if (m == 0 || hiI >= m) Long.MaxValue
                     else s(hiI)
            (gs, p.toLong, target, lo, hi)
          }
        }
        val specDf = spark.createDataFrame(
          spark.sparkContext.parallelize(spec.map { case (gs, p, t, lo, hi) =>
            org.apache.spark.sql.Row.fromSeq(gs ++ Seq(p, t, lo, hi))
          }),
          org.apache.spark.sql.types.StructType(
            groupCols.map(g => base.schema(g).copy(name = s"__g_$g")) ++
              Seq("__percent", "__target", "__lo", "__hi").map(n =>
                org.apache.spark.sql.types.StructField(n,
                  org.apache.spark.sql.types.LongType, nullable = false))))

        // Pass 2: bucketize against the broadcast spec — 'below' collapses
        // map-side, band values shuffle individually, above drops.
        val joinCond = groupCols.map(g => col(g) === col(s"__g_$g"))
          .reduce(_ && _)
        // Eager checkpoint instead of the previous persist (r15
        // optimization round): bucketed is tiny (band values only) but
        // feeds THREE consumers (below counts, the ranked window, the
        // result) — the checkpoint materializes the heavy scan+agg in
        // ONE job and every consumer reads the leaf, where the persist
        // variant re-planned the window+join chain per action.
        val bucketed = base.join(broadcast(specDf), joinCond)
          .where(col("__v") <= col("__hi"))
          .groupBy((groupCols.map(col) :+ col("__percent") :+
            col("__target") :+ col("__lo") :+
            when(col("__v") <= col("__lo"), lit(null))
              .otherwise(col("__v")).as("__band_v")): _*)
          .agg(count(lit(1)).as("__c"))
          .truncate(true)

        val keyCols = groupCols.map(col) :+ col("__percent")
        val belowDf = bucketed.where(col("__band_v").isNull)
          .select((keyCols :+ col("__c").as("__below")): _*)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols: _*).orderBy(col("__band_v"))
        val ranked = bucketed.where(col("__band_v").isNotNull)
          .join(belowDf, (groupCols :+ "__percent"), "left")
          .na.fill(0L, Seq("__below"))
          .withColumn("__rank", col("__below") + sum(col("__c")).over(w))

        // Bracket verification: rank(lo) < target ≤ rank(hi) per spec row.
        val checks = ranked
          .groupBy((keyCols :+ col("__target")): _*)
          .agg(max(col("__rank")).as("__rank_hi"),
            min(col("__below")).as("__rank_lo"))
          .withColumn("__ok",
            col("__rank_lo") < col("__target") &&
              col("__target") <= col("__rank_hi"))
          .select((keyCols :+ col("__ok")): _*)
          .collect()
        val allOk = checks.nonEmpty && checks.forall(!_.isNullAt(
          groupCols.length + 1)) && checks.forall(_.getBoolean(groupCols.length + 1))
        // Specs whose band came back EMPTY don't appear in `checks`; they
        // also need a retry unless the group itself is empty.
        val expected = spec.count { case (_, _, t, _, _) => t > 0 }
        if (allOk && checks.length == expected) {
          result = Some(ranked
            .where(col("__rank") >= col("__target"))
            .groupBy(keyCols: _*)
            .agg(min(col("__band_v")).as("quantile"))
            .withColumnRenamed("__percent", "percent"))
        } else {
          delta = delta * 4
        }
      }
      // result reads a checkpointed leaf; the final checkpoint pins it
      // before base unpersists
      result.get.truncate(true)
    } finally base.unpersist(): Unit
  }

  /** Winsorize: clip `value` into its group's [pLow, pHigh] exact-quantile
    * envelope — the standard robust feature-preprocessing step, composed
    * on [[quantiles]]: the (tiny) per-group bounds broadcast back onto the
    * scan, so the clip itself adds no shuffle. Output: the input columns
    * plus `<valueAs>` (clipped BIGINT). */
  def winsorize(df: DataFrame, groupCols: Seq[String], value: Column,
      rowKey: Column, pLow: Int, pHigh: Int, valueAs: String,
      k: Int = 4096): DataFrame = {
    require(pLow < pHigh, s"pLow=$pLow must be < pHigh=$pHigh")
    val qs = quantiles(df, groupCols, value, rowKey, Seq(pLow, pHigh), k)
    val bounds = qs.groupBy(groupCols.map(col): _*)
      .agg(min(when(col("percent") === pLow, col("quantile"))).as("__qlo"),
        max(when(col("percent") === pHigh, col("quantile"))).as("__qhi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(valueAs,
        least(greatest(value.cast("long"), col("__qlo")), col("__qhi")))
      .drop("__qlo", "__qhi")
  }

  /** Trimmed aggregate: per-group count/sum over only the values inside
    * the group's [pLow, pHigh] exact-quantile envelope — the
    * trimmed-mean/robust-total building block (outliers DROPPED, where
    * [[winsorize]] clips them to the fence). Exact-integer semantics: the
    * fences are the same rank-selected cut values quantiles() returns
    * (boundary values INCLUSIVE on both sides), so n_kept/sum_kept are
    * plain filtered aggregates any engine replays. The mean itself stays
    * a (sum_kept, n_kept) pair — integer sufficient statistics, divided
    * only when a float is finally wanted.
    *
    * Cost: the two bounded-sample quantile scans + ONE more scan with the
    * (tiny) fences broadcast back — no sort, no re-shuffle of the data.
    * Output: groupCols ++ (q_lo, q_hi, n_total, n_kept, sum_kept). */
  def trimmedStats(df: DataFrame, groupCols: Seq[String], value: Column,
      rowKey: Column, pLow: Int, pHigh: Int, k: Int = 4096): DataFrame = {
    require(pLow < pHigh, s"pLow=$pLow must be < pHigh=$pHigh")
    val qs = quantiles(df, groupCols, value, rowKey, Seq(pLow, pHigh), k)
    val bounds = qs.groupBy(groupCols.map(col): _*)
      .agg(min(when(col("percent") === pLow, col("quantile"))).as("q_lo"),
        max(when(col("percent") === pHigh, col("quantile"))).as("q_hi"))
    val v = value.cast("long")
    val kept = v >= col("q_lo") && v <= col("q_hi")
    df.join(broadcast(bounds), groupCols)
      .groupBy((groupCols.map(col) :+ col("q_lo") :+ col("q_hi")): _*)
      .agg(count(lit(1)).as("n_total"),
        coalesce(sum(when(kept, 1L)), lit(0L)).as("n_kept"),
        coalesce(sum(when(kept, v)), lit(0L)).as("sum_kept"))
  }

  /** Equi-depth (quantile) discretization — the feature-binning step of a
    * training pipeline: `buckets` bins whose cut points are the exact
    * b·(100/buckets)-percentiles of `value`, assigned map-side. Rows land
    * in bucket 1 + |{cuts < v}| with boundary ties collapsing LEFT (every
    * row equal to a cut shares the lower bucket) — value-deterministic
    * semantics an oracle can replay, independent of row order.
    *
    * No global sort anywhere: the cuts come from [[quantiles]] (bounded
    * sample + band refinement — two scans), then ride the plan as
    * LITERALS, so assignment is one codegen'd projection with no join, no
    * exchange, and downstream per-bucket aggregation shuffles `buckets`
    * groups. The naive ntile() alternative is a single-partition global
    * sort — unrunnable at 100 TB. `buckets` must divide 100 (integer
    * percent grid). Output: input columns + `<bucketAs>` (1-based INT). */
  def equiDepthBins(df: DataFrame, value: Column, rowKey: Column,
      buckets: Int, bucketAs: String, k: Int = 4096): DataFrame =
    df.withColumn(bucketAs,
      binColumn(equiDepthCuts(df, value, rowKey, buckets, k), value))

  /** The B−1 exact equi-depth cut values of `value` (the b·(100/B)
    * percentiles), as a sorted array — the reusable half of
    * [[equiDepthBins]] for callers that bin a DIFFERENT frame against
    * this one's distribution (CDF featurization, PSI drift bins). A
    * bounded driver action: B−1 longs. */
  def equiDepthCuts(df: DataFrame, value: Column, rowKey: Column,
      buckets: Int, k: Int = 4096): Array[Long] = {
    require(buckets >= 2 && 100 % buckets == 0,
      s"buckets=$buckets must be >= 2 and divide 100")
    val percents = (1 until buckets).map(_ * (100 / buckets))
    // quantiles() wants at least one grouping column; a constant gives the
    // global computation (one group → one bounded sample row)
    quantiles(df.withColumn("__all", lit(1)), Seq("__all"),
        value, rowKey, percents, k)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).map(_._2)
  }

  /** Bucket assignment against fixed cut values: 1 + |cuts strictly below
    * v| — a literal codegen'd fold, boundary ties collapse left. */
  def binColumn(cuts: Array[Long], value: Column): Column =
    cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(value.cast("long") > lit(c), 1).otherwise(0)
    }

  /** GLOBAL discrete percentiles by the histogram-and-cumulative-rank
    * rule: collapse to (value → count) first (map-side combine — the
    * only full-data pass), then a rank window over the HISTOGRAM picks
    * the smallest value with cum ≥ ⌈n·p/100⌉ per percent. The
    * single-partition window touches |distinct values| rows, not data —
    * exact and cheap for quantized metrics (durations, cents); for few
    * known groups prefix `df` with a per-group loop, for unbounded value
    * domains use [[quantiles]] (bounded-sample) or the one-pass
    * [[graft.agg.QuantileSketch]]. Output: (percent, quantile). */
  def histogramPercentiles(df: DataFrame, value: Column,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100))
    val hist = df.select(value.cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val byV = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("__v"))).orderBy(col("__v"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(Census.onePartKey(col("__v")))
    hist
      .withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__n", sum(col("__c")).over(all))
      .select(col("__v"), col("__cum"), col("__n"),
        explode(array(percents.map(p => lit(p.toLong)): _*)).as("percent"))
      .where(col("__cum") * lit(100L) >= col("__n") * col("percent"))
      .groupBy(col("percent")).agg(min(col("__v")).as("quantile"))
  }

  /** Per-group exact percentiles from per-group value histograms — the
    * daily-dashboard form of [[histogramPercentiles]] (p50/p95/p99 per
    * day/service/segment): one (group, value) census, one cumulative
    * window per group over census cells, percentile = smallest value
    * whose cumulative rank covers p% (the same integer rule). Output:
    * (group cols, percent, quantile). */
  def groupedHistogramPercentiles(df: DataFrame, groupCols: Seq[String],
      value: Column, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100))
    val hist = df.select(groupCols.map(col) :+ value.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    hist
      .withColumn("__cum", sum(col("__c")).over(byV))
      .withColumn("__n", sum(col("__c")).over(all))
      .select(groupCols.map(col) ++ Seq(col("__v"), col("__cum"), col("__n"),
        explode(array(percents.map(p => lit(p.toLong)): _*)).as("percent")): _*)
      .where(col("__cum") * lit(100L) >= col("__n") * col("percent"))
      .groupBy(groupCols.map(col) :+ col("percent"): _*)
      .agg(min(col("__v")).as("quantile"))
  }

  /** Weighted half-point per group — "by which x had half the weight
    * accrued" (revenue half-life when x is time and the weight is
    * money): the smallest `orderCol` cell whose cumulative weight
    * doubles past the group total, decided in exact integers. One
    * census aggregation, one window over census cells. Output:
    * (group, n_cells, total_weight, half_point). */
  def weightedHalfPoint(df: DataFrame, groupCols: Seq[String],
      orderCol: Column, weight: Column): DataFrame = {
    val cells = df.select((groupCols.map(col) :+
        orderCol.cast("long").as("__x") :+ weight.cast("long").as("__w")): _*)
      .groupBy(groupCols.map(col) :+ col("__x"): _*)
      .agg(sum(col("__w")).as("__c"))
    val byX = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("__x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    cells
      .withColumn("__cum", sum(col("__c")).over(byX))
      .withColumn("__total", sum(col("__c")).over(all))
      .withColumn("__nc", count(lit(1)).over(all))
      .where(col("__cum") * 2 >= col("__total"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__nc")).as("n_cells"),
        max(col("__total")).as("total_weight"),
        min(col("__x")).as("half_point"))
  }
}
