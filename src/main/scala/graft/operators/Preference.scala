package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Preference-pair rating aggregation — the batch op that turns raw
  * pairwise comparisons ("A beat B") into per-item strength ratings, the
  * workhorse of preference-data curation for reward-model / RLHF
  * training sets (which responses are strong? which annotator pairs are
  * inconsistent? what to oversample?).
  *
  * Model: Bradley–Terry (Zermelo 1929; Bradley & Terry 1952) —
  * P[i beats j] = r_i / (r_i + r_j) — fit by the MM algorithm of Hunter
  * 2004 ("MM algorithms for generalized Bradley-Terry models", Annals of
  * Statistics §1): each round
  *   r_i ← W_i / Σ_{j≠i} n_ij / (r_i + r_j)
  * where W_i = total wins of i and n_ij = comparisons between i and j.
  * Each update uses only pair-level sufficient statistics, so a round is
  * ONE join of the (persisted, deduped) pair-count frame with the rating
  * frame + one partial-sum aggregate — the pageRankE9 round shape; no
  * per-item loops, no raw comparison rows after the first aggregation.
  *
  * Integer fixed-point discipline (hash-gates cross-engine): ratings live
  * in e6 (1e6 = 1.0), the pair term is n_ij·1e12 div (r_i + r_j) and the
  * update W_i·1e12 div D_i, renormalized each round to max = 1e6 — all
  * truncating division on non-negative operands, so a SQL oracle replays
  * every round with `//` bit-exactly. Ratings clamp to ≥ 1 (a zero-win
  * item's MLE is 0; the clamp keeps later denominators positive and the
  * fixture total), mirroring the max-norm clamp in [[Graph.hitsE6]].
  *
  * Determinism: a FIXED iteration count (not a convergence test — float
  * tolerances don't hash-gate), synchronous updates from the previous
  * round's ratings, and no order-dependence anywhere (sums are
  * commutative, renorm is a global max).
  *
  * Scale shape: comparisons collapse to (pair → n) once (map-side
  * combine); every round shuffles |pairs| rows for the term sum and
  * |items| for the update — at 100 TB of raw comparisons the iteration
  * cost depends only on the distinct-pair count. Per-round eager
  * localCheckpoint is load-bearing for the same reason as hitsE6: the
  * max-renorm embeds a scalar broadcast subquery per round and a lazy
  * nested chain of those overflows plan-tree recursion under AQE.
  *
  * Round-join strategy (r14 probe finding): the per-round rating frame
  * is a localCheckpointed leaf whose size Catalyst can't estimate, so
  * left alone BOTH per-round joins against the pair census ran as full
  * shuffle joins — ~2.2 s/round on a 1.2M-pair census whose item side
  * is 1,000 rows. The item count is known after the census builds
  * (one count() on the persisted items frame), so ratings are wrapped
  * in broadcast() whenever |items| ≤ [[maxBroadcastItems]] — the pair
  * census then never re-shuffles across rounds. Above the bound the
  * plan falls back to shuffle joins (correct at any item count).
  *
  * Domain contract (documented like [[groupAdvantageE6]]'s): the
  * per-round denominator D_i = Σ_j n_ij·1e12 div (r_i + r_j) is a LONG
  * sum whose worst case is comparisons_i · 5e11 (every opponent pinned
  * at the clamp r = 1, so r_i + r_j ≥ 2) — it fits LONG while any one
  * item carries < ~1.8e7 comparisons against minimum-rated opponents.
  * Real preference corpora sit orders of magnitude under that (and
  * opponents at r = 1 means the item's own rating is ≥ theirs, pushing
  * the divisor up); past it, Spark wraps while the DuckDB oracle
  * raises. Callers with adversarial comparison mass should pre-split
  * items or rescale the fixed point.
  *
  * Output: (item, rating_e6, wins, comparisons) for every item seen on
  * either side of any comparison. The returned frame is an EAGER
  * localCheckpoint — the internal pair/item caches are unpersisted
  * before returning, so callers inherit no cached state.
  */
object Preference {

  /** Group-relative advantage normalization — the reward-shaping step of
    * group-sampled RL training-data prep (k responses per prompt, each
    * reward normalized against its OWN group): adv = (r − mean) / sd,
    * computed EXACTLY in integers via the same cancellation
    * [[CorpusOps.neymanAllocation]] uses — with n·sd = isqrt(n·Σr² −
    * (Σr)²) (exact corrected isqrt),
    *   adv_e6 = (r·n − Σr) · 1e6 div isqrt(n·Σr² − (Σr)²)
    * since (r − Σr/n)/sd = (r·n − Σr)/(n·sd). Truncating div on the
    * signed numerator (toward zero, matching SQL `//`... `div`), so an
    * oracle replays it bit-exactly. Degenerate groups (n < 2 or zero
    * variance) emit 0.
    *
    * Shape: one window partition by the group keys (groups are small by
    * construction — k responses per prompt — so the per-partition sort
    * is trivial and there is no second join shuffle); the isqrt
    * correction is a codegen'd per-row CASE.
    *
    * Domain: r·n and n·Σr² must fit in a LONG — rewards in modest
    * integer units (the Neyman scaling contract).
    *
    * Output: the input columns + `advAs` (BIGINT, e6 fixed point). */
  def groupAdvantageE6(df: DataFrame, groupCols: Seq[String],
      reward: Column, advAs: String = "adv_e6"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    df.withColumn("__r", reward.cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__r")).over(w))
      .withColumn("__ss", sum(expr("__r * __r")).over(w))
      .withColumn("__vn", expr("__n * __ss - __s * __s"))
      .withColumn("__s0",
        floor(sqrt(col("__vn").cast("double"))).cast("long"))
      // correction squares in DECIMAL(38,0): for vn within ~6e9 of
      // Long.MaxValue the LONG square wraps silently (non-ANSI) while
      // the DuckDB oracle raises — widening keeps both engines exact
      // and identical over the full LONG domain of vn
      .withColumn("__sd", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __vn
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __vn
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .withColumn(advAs, expr(
        """CASE WHEN __n < 2 OR __sd <= 0 THEN 0L
          | ELSE (__r * __n - __s) * 1000000L div __sd END""".stripMargin))
      .drop("__r", "__n", "__s", "__ss", "__vn", "__s0", "__sd")
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff 1970/2004;
    * Hayes & Krippendorff 2007 computational form) — the rating-
    * RELIABILITY readout of annotation curation: "do the raters of a
    * unit agree beyond chance", robust to varying raters-per-unit and
    * missing ratings (unlike Cohen's κ, which needs exactly two fixed
    * raters — [[Profile.cohenKappa]], q249). The number every
    * preference-data pipeline reads before trusting its labels.
    *
    * Coincidence-matrix identity used (algebraically equal to
    * 1 − D_o/D_e for the nominal metric):
    *   α = ((n−1)·Σ_c o_cc + (n − Σ_c n_c²)) / (n·(n−1) − (Σ_c n_c² − n))
    * with o_cc = Σ_u o_uc(o_uc−1)/(m_u−1), n_c = Σ_u o_uc, n = Σ_u m_u,
    * over units with m_u ≥ 2 ratings (single-rating units are
    * unpairable and drop — the standard rule).
    *
    * Exact-integer discipline: the only fractions are the per-unit
    * 1/(m_u−1) factors, so everything scales by S = lcm(1…maxRaters−1)
    * — (m_u−1) | S exactly — and α = alpha_num/alpha_den emerges as a
    * ratio of DECIMAL(38,0) integers plus a truncating-div e6 headline
    * (div toward zero ≡ DuckDB `//`). Magnitude contract: alpha_num ~
    * n²·S·maxRaters² must fit DECIMAL(38,0) — at S = 360360 (the
    * default's lcm(1…15)) that is good past 10¹² ratings.
    *
    * Scale shape: one (unit, category) hash aggregate (map-side
    * combined — the only pass over raw ratings), one per-unit and one
    * per-category aggregate off it, two single-row reductions crossed
    * at the end. No window, no sort, no driver data. Units with
    * m_u > maxRaters RAISE in-plan (assert_true — S stops dividing
    * (m_u−1) exactly past the bound); pre-filter or raise `maxRaters`
    * deliberately rather than silently mis-weighting.
    *
    * Output: one row (n, n_units, n_categories, alpha_num DECIMAL,
    * alpha_den DECIMAL, alpha_e6 BIGINT — NULL when α is undefined,
    * i.e. a single observed category). */
  def krippendorffAlphaNominal(df: DataFrame, unit: Column,
      category: Column, maxRaters: Int = 16): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 36,
      s"maxRaters=$maxRaters out of [2, 36] (S = lcm(1..k-1) must keep " +
        "per-unit terms in LONG)")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)
    val s = (1 until maxRaters).foldLeft(1L)((acc, k) => acc / gcd(acc, k) * k)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cell = df.select(unit.as("__u"), category.cast("string").as("__c"))
      .where(col("__u").isNotNull && col("__c").isNotNull)
      .groupBy(col("__u"), col("__c")).agg(count(lit(1)).as("__o"))
      .persist(mem)
    val perUnit = cell.groupBy(col("__u"))
      .agg(sum(col("__o")).as("__m"),
        sum(expr("__o * (__o - 1)")).as("__dd"))
      .where(col("__m") >= 2L)
    val d = (c: Column) => c.cast("decimal(38,0)")
    // per-unit diagonal mass, exactly scaled by S; m > maxRaters raises
    val unitAgg = perUnit.agg(
      sum(col("__m")).as("n"),
      count(lit(1)).as("n_units"),
      sum(d(expr(s"__dd * ($s div (__m - 1))") +
        coalesce(assert_true(col("__m") <= lit(maxRaters.toLong),
          concat(lit(s"krippendorffAlphaNominal: unit with more than " +
            s"$maxRaters ratings ("), col("__m").cast("string"),
            lit(") — raise maxRaters or pre-cap units")))
          .cast("long"), lit(0L)))).as("__a"))
    val byCat = cell.join(perUnit.select(col("__u")), Seq("__u"))
      .groupBy(col("__c")).agg(sum(col("__o")).as("__nc"))
    val catAgg = byCat.agg(count(lit(1)).as("n_categories"),
      sum(d(col("__nc")) * d(col("__nc"))).as("__n2"))
    val out = unitAgg.crossJoin(catAgg)
      .select(col("n"), col("n_units"), col("n_categories"),
        (d(col("n") - 1L) * col("__a") +
          lit(s) * (d(col("n")) - col("__n2"))).as("alpha_num"),
        (lit(s) * (d(col("n")) * d(col("n")) - col("__n2"))).as("alpha_den"))
      .withColumn("alpha_e6", expr(
        """CASE WHEN alpha_den = 0 THEN NULL
          | ELSE CAST(alpha_num * 1000000 div alpha_den AS BIGINT) END"""
          .stripMargin))
      .truncate(true)
    cell.unpersist()
    out
  }

  /** DPO-pair construction stats: the margin distribution of observed
    * preference pairs under fitted ratings — the readout a
    * preference-data curator reads before exporting chosen/rejected
    * pairs (Rafailov et al. 2023's data side): margin = r_winner −
    * r_loser per pair; big positive margins are easy pairs (candidates
    * for down-sampling), near-zero margins are the informative ones,
    * and NEGATIVE margins are fitted-model-vs-label disagreements —
    * the label-noise review queue.
    *
    * Exactness: margins are e6 LONG differences; buckets use explicit
    * FLOOR division written with nonnegative operands only (CASE on
    * sign), so truncating `div`/`//` replays it identically; shares are
    * n·1e6 div total.
    *
    * Scale shape: pairs stream through two broadcast joins against the
    * (small) ratings frame — comparisons never shuffle; the histogram
    * aggregate is map-side combined onto |buckets| cells, and the share
    * denominator is a single-row reduction OF THE HISTOGRAM (the pair
    * scan runs once).
    *
    * `ratings` must carry (item, rating_e6) — [[bradleyTerryE6]]'s
    * output shape. Output: (margin_bucket, n_pairs, share_e6). */
  def pairMarginHistogramE6(pairs: DataFrame, winner: Column,
      loser: Column, ratings: DataFrame,
      bucketE6: Long = 100000L): DataFrame = {
    require(bucketE6 >= 1L, s"bucketE6=$bucketE6 must be >= 1")
    val cmp = pairs.select(winner.as("__w"), loser.as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull &&
        col("__w") =!= col("__l"))
    val rw = ratings.select(col("item").as("__w"),
      col("rating_e6").as("__rw"))
    val rl = ratings.select(col("item").as("__l"),
      col("rating_e6").as("__rl"))
    val h = cmp.join(broadcast(rw), Seq("__w"))
      .join(broadcast(rl), Seq("__l"))
      .withColumn("__m", col("__rw") - col("__rl"))
      .withColumn("margin_bucket", expr(
        s"""CASE WHEN __m >= 0 THEN __m div $bucketE6
           | ELSE -((-__m + ${bucketE6 - 1L}) div $bucketE6) END"""
          .stripMargin))
      .groupBy(col("margin_bucket")).agg(count(lit(1)).as("n_pairs"))
      .truncate(true) // |buckets| rows; feeds rows + denominator
    h.crossJoin(broadcast(h.agg(sum(col("n_pairs")).as("__tot"))))
      .select(col("margin_bucket"), col("n_pairs"),
        expr("n_pairs * 1000000 div __tot").as("share_e6"))
  }

  /** Krippendorff's alpha, INTERVAL metric — [[krippendorffAlphaNominal]]
    * for NUMERIC ratings, where disagreement is squared distance
    * δ²(c,k) = (c−k)² (Krippendorff 2004 §11.3). The δ² weighting
    * collapses the whole coincidence matrix into per-unit variance
    * sufficient statistics:
    *   Σ_{c,k} o_uc·o_uk·(c−k)² = 2·(m_u·Σx² − (Σx)²)   per unit,
    *   Σ_{c,k} n_c·n_k·(c−k)²  = 2·(n·ΣX² − (ΣX)²)     globally,
    * so α = (S·E − (n−1)·A) / (S·E) with A = Σ_u 2(m·ss−s²)·S/(m_u−1)
    * and E = 2(n·SS − SUMS²) — ONE pass to unit grain and ONE one-row
    * reduction; the global sums reuse the per-unit (s, ss), so the raw
    * ratings are scanned exactly once. Same S = lcm(1…maxRaters−1)
    * exact-fraction scaling, DECIMAL(38,0) ratio + truncating-div e6
    * headline, and in-plan m ≤ maxRaters assert as the nominal form.
    *
    * Domain: m·Σx² and (Σx)² must fit LONG per unit — |rating| up to
    * ~2·10⁷ at maxRaters = 36 (integer star-ratings, bucketed scores
    * and fixed-point grades all sit far inside).
    *
    * Output: one row (n, n_units, alpha_num DECIMAL, alpha_den DECIMAL,
    * alpha_e6 BIGINT — NULL when every rating is identical). */
  def krippendorffAlphaInterval(df: DataFrame, unit: Column,
      value: Column, maxRaters: Int = 16): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 36,
      s"maxRaters=$maxRaters out of [2, 36]")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)
    val s = (1 until maxRaters).foldLeft(1L)((acc, k) => acc / gcd(acc, k) * k)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val perUnit = df.select(unit.as("__u"), value.cast("long").as("__x"))
      .where(col("__u").isNotNull && col("__x").isNotNull)
      .groupBy(col("__u"))
      .agg(count(lit(1)).as("__m"), sum(col("__x")).as("__s"),
        sum(expr("__x * __x")).as("__ss"))
      .where(col("__m") >= 2L)
    // per-unit observed-disagreement mass, exactly S-scaled; the guard
    // rides the LONG half of the product so overflow can't precede it
    val a2Term = d(expr("2 * (__m * __ss - __s * __s)") +
        coalesce(assert_true(col("__m") <= lit(maxRaters.toLong),
          concat(lit(s"krippendorffAlphaInterval: unit with more than " +
            s"$maxRaters ratings ("), col("__m").cast("string"),
            lit(") — raise maxRaters or pre-cap units")))
          .cast("long"), lit(0L))) *
      expr(s"$s div (__m - 1)")
    val two = lit(2).cast("decimal(38,0)")
    perUnit.agg(
        sum(col("__m")).as("n"),
        count(lit(1)).as("n_units"),
        sum(a2Term).as("__a2"),
        sum(d(col("__s"))).as("__sums"),
        sum(d(col("__ss"))).as("__sstot"))
      .select(col("n"), col("n_units"),
        (lit(s) * (two * (d(col("n")) * col("__sstot") -
            col("__sums") * col("__sums"))) -
          d(col("n") - 1L) * col("__a2")).as("alpha_num"),
        (lit(s) * (two * (d(col("n")) * col("__sstot") -
          col("__sums") * col("__sums")))).as("alpha_den"))
      .withColumn("alpha_e6", expr(
        """CASE WHEN alpha_den = 0 THEN NULL
          | ELSE CAST(alpha_num * 1000000 div alpha_den AS BIGINT) END"""
          .stripMargin))
  }

  /** Noisy-label aggregation with annotator reliability — the one-coin
    * Dawid–Skene model (Dawid & Skene 1979) in its deterministic
    * hard-EM form (iterative weighted majority vote): each round
    * re-estimates every annotator's accuracy against the current
    * consensus labels, converts it to a log-odds vote weight, and
    * re-labels every item by weighted vote. Two fixed rounds recover
    * most of soft-EM's gain (Li & Yu 2014's analysis of weighted
    * majority voting) while staying hash-gateable — soft posteriors
    * are float products that no cross-engine gate can pin.
    *
    * Exactness discipline: accuracies are Laplace-smoothed exact
    * integers acc_e6 = (matches+1)·1e6 div (n+2) (never 0 or 1e6, so
    * the log-odds is finite); each weight is ONE pinned double
    * pipeline w = round(ln(p·(K−1)/(1−p))·1e6) on those integers (the
    * BM25 rule: integer-rounded BEFORE summation, so per-item tallies
    * are exact LONG sums); argmaxes break ties (score desc, label asc)
    * — a total order. K = distinct labels, a one-row census collect.
    *
    * Scale shape: votes persist once, pre-partitioned by item; per
    * round the consensus and weight frames join in as counted
    * broadcasts (≤3M rows, shuffle joins beyond) and both hash
    * aggregates reuse the cached item clustering, so the only per-round
    * exchange is the ~|annotators|-row accuracy partial sum — no
    * window, no driver data beyond the one-row (K, |items|,
    * |annotators|) census; per-round eager localCheckpoint (the
    * bradleyTerryE6 / hitsE6 planner-recursion rule). Each annotator
    * row weighs every one of their votes; duplicate (item, annotator)
    * votes count once each by design (a row is a vote).
    *
    * Output: (item, label, n_votes) — the consensus label after
    * `iterations` reweighting rounds and the item's total vote count. */
  def dawidSkeneOneCoinE6(votes0: DataFrame, item: Column,
      annotator: Column, label: Column, iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 8)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = votes0.sparkSession
    // Votes persist PRE-PARTITIONED by item (explicit count — AQE would
    // coalesce a keyed repartition of a cache-sized frame to 1-2
    // partitions): with the item/annotator frames broadcast into the
    // round joins (counted below), every per-round tally and argmax
    // reuses this cached clustering (hash(i) satisfies both the (i, l)
    // tally and the i argmax distribution), so a round's only exchange
    // is the ~|annotators| partial-sum of the accuracy census — the old
    // shape shuffled the full vote frame twice per round (r16, guide
    // §2.4).
    val votes = votes0.select(item.as("i"), annotator.as("a"),
        label.cast("string").as("l"))
      .where(col("i").isNotNull && col("a").isNotNull && col("l").isNotNull)
      .repartition(spark.sparkContext.defaultParallelism, col("i"))
      .persist(mem)
    // one census action folds the label count (K, the log-odds scalar)
    // with the item/annotator cardinalities the counted broadcast
    // decisions need — was one action for K alone
    val census = votes.agg(
      count_distinct(col("l")).as("k"),
      count_distinct(col("i")).as("ni"),
      count_distinct(col("a")).as("na")).first()
    val (k, nItems, nAnnot) =
      (census.getLong(0), census.getLong(1), census.getLong(2))
    def mbI(df: DataFrame): DataFrame = maybeBroadcast(df, nItems)
    def mbA(df: DataFrame): DataFrame = maybeBroadcast(df, nAnnot)
    def argmax(scored: DataFrame, score: Column): DataFrame =
      scored.groupBy(col("i"))
        .agg(min(struct((-score).as("ns"), col("l").as("l"))).as("m"))
        .select(col("i"), col("m.l").as("cl"))
    var cur = argmax(
      votes.groupBy(col("i"), col("l")).agg(count(lit(1)).as("n")),
      col("n")).truncate(false)
    for (_ <- 1 to iterations) {
      val acc = votes.join(mbI(cur), Seq("i"))
        .groupBy(col("a"))
        .agg(count(lit(1)).as("na"),
          sum(when(col("l") === col("cl"), 1L).otherwise(0L)).as("ma"))
        .withColumn("acc_e6", expr("(ma + 1) * 1000000 div (na + 2)"))
      // pinned double pipeline, mirrored literally in the oracle SQL
      val w =
        if (k > 1) expr(
          s"""CAST(round(ln(CAST(acc_e6 AS DOUBLE) / 1000000.0
             | * ${k - 1}.0
             | / (1.0 - CAST(acc_e6 AS DOUBLE) / 1000000.0))
             | * 1000000.0) AS BIGINT)""".stripMargin)
        else lit(0L)
      val tally = votes.join(mbA(acc.select(col("a"), w.as("w"))), Seq("a"))
        .groupBy(col("i"), col("l")).agg(sum(col("w")).as("s"))
      // lazy: the next consumer (the following round's broadcast build,
      // or the eager final pin) materializes the blocks — the per-round
      // eager-checkpoint job was scheduler floor (r16, verdict item 7)
      cur = argmax(tally, col("s")).truncate(false)
    }
    val out = mbI(cur)
      .join(votes.groupBy(col("i")).agg(count(lit(1)).as("n_votes")),
        Seq("i"))
      .select(col("i").as("item"), col("cl").as("label"), col("n_votes"))
      .truncate(true)
    votes.unpersist()
    out
  }

  /** Item-grain frames at or under this bound broadcast in the MM round
    * joins (16 bytes/row → ~48 MB at the bound — inside Spark's default
    * broadcast memory comfort zone); larger item sets fall back to
    * shuffle joins. */
  private val maxBroadcastItems = 3000000L

  private def maybeBroadcast(df: DataFrame, nItems: Long): DataFrame =
    if (nItems <= maxBroadcastItems) broadcast(df) else df

  def bradleyTerryE6(pairs: DataFrame, winner: Column, loser: Column,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 16)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cmp = pairs.select(winner.as("w"), loser.as("l"))
      .where(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
    // pair-level sufficient statistics: n_ab over unordered pairs
    val und = cmp.select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .persist(mem)
    val wins = cmp.groupBy(col("w").as("id")).agg(count(lit(1)).as("wins"))
    val comps = und.select(col("a").as("id"), col("n"))
      .unionByName(und.select(col("b").as("id"), col("n")))
      .groupBy(col("id")).agg(sum(col("n")).as("comparisons"))
    val items = comps.join(wins, Seq("id"), "left")
      .select(col("id"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("comparisons"))
      .persist(mem)
    val nItems = items.count()
    var r = items.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iterations) {
      val terms = und
        .join(maybeBroadcast(
          r.select(col("id").as("a"), col("r").as("ra")), nItems), "a")
        .join(maybeBroadcast(
          r.select(col("id").as("b"), col("r").as("rb")), nItems), "b")
        .withColumn("t", expr("n * 1000000000000L div (ra + rb)"))
      val denom = terms.select(col("a").as("id"), col("t"))
        .unionByName(terms.select(col("b").as("id"), col("t")))
        .groupBy(col("id")).agg(sum(col("t")).as("d"))
      // Materialize the round subtree ONCE (r15 optimization round):
      // checkpoint `raw`, then the broadcast max and the renormalized
      // frame both read the LogicalRDD leaf. The previous shape
      // (checkpoint AFTER the crossJoin) executed the full
      // join+aggregate round twice per iteration — once under the
      // max-broadcast build, once under the checkpoint. Plan depth
      // stays constant: the lazy residue per round is leaf+crossJoin.
      // LAZY since r16: the max-broadcast build is the next job anyway
      // and computes every partition, so it materializes the checkpoint
      // blocks itself — the separate eager-checkpoint job per round was
      // pure scheduler floor (verdict item 7, actions-per-gate audit:
      // q333 ran 42 jobs at sf0.001).
      val rawCp = items.join(denom, Seq("id"))
        .select(col("id"),
          greatest(lit(1L), expr("wins * 1000000000000L div d")).as("r"))
        .truncate(false)
      val m = rawCp.agg(max(col("r")).as("m"))
      r = rawCp.crossJoin(broadcast(m))
        .select(col("id"),
          greatest(lit(1L), expr("r * 1000000 div m")).as("r"))
    }
    val out = items.join(r, Seq("id"))
      .select(col("id").as("item"), col("r").as("rating_e6"),
        col("wins"), col("comparisons"))
      .truncate(true) // pin before dropping the caches it reads
    und.unpersist()
    items.unpersist()
    out
  }

  /** Bradley–Terry with ties — the Rao–Kupper model (Rao & Kupper
    * 1967) at a FIXED tie threshold θ > 1, fit by Hunter 2004's MM
    * (§5): P(i beats j) = r_i/(r_i + θr_j), P(tie) follows from the
    * threshold. Preference corpora with "both responses equal" labels
    * need this — dropping ties biases ratings toward items that duel
    * decisive opponents. θ stays a caller-fixed rational (estimating
    * it adds a non-integer root; at fixed θ the MM update keeps the
    * [[bradleyTerryE6]] shape exactly):
    *
    *   r_i ← (W_i + T_i) div Σ_j [ (w_ij + t_ij)/(r_i + θr_j)
    *                             + θ(w_ji + t_ij)/(r_j + θr_i) ]
    *
    * in the same e6/e12 fixed point, θ applied as θr = θ_e6·r div 1e6.
    * The per-ITEM denominator sums ride DECIMAL(38,0) (the oracle's
    * HUGEINT), so unlike [[bradleyTerryE6]]'s documented bound an
    * item's total comparison mass is unbounded; the remaining LONG
    * contract is per-PAIR — a single unordered pair needs < ~9e6
    * duels while both ratings sit at the clamp (the two-term side sum
    * is ≤ n·1e12 div 2), far beyond any real duplicate-duel count. Same per-round eager
    * localCheckpoint (max-renorm broadcast subquery chain), same ≥1
    * clamps, same synchronous rounds.
    *
    * Scale shape: duels collapse once to unordered-pair sufficient
    * statistics (w_ab, w_ba, t_ab); each round is one join + one
    * partial-sum aggregate over |pairs| rows.
    *
    * Output: (item, rating_e6, wins, ties, comparisons); `outcome` is
    * +1 (a wins), −1 (b wins), or 0 (tie). */
  /** Pairwise inter-annotator agreement matrix — per annotator PAIR,
    * Cohen's κ over their SHARED items: the structural view the
    * corpus-level α ([[krippendorffAlphaNominal]]) and the per-annotator
    * reliabilities ([[dawidSkeneOneCoinE6]]) both summarize away, and
    * the tool that finds the one annotator pair that disagrees with
    * each other while agreeing with everyone else (rubric drift,
    * shared-account artifacts).
    *
    * Exact integers throughout: with n shared items, observed-agreement
    * count po and expected-agreement mass pe_num = Σ_l c1(l)·c2(l)
    * (each annotator's label histogram over the SHARED set),
    *   κ = (po·n − pe_num) / (n² − pe_num)
    * as a DECIMAL(38,0) ratio + truncating-div e6 headline. One label
    * per (item, annotator) — duplicate votes collapse to the MINIMUM
    * label (a total order, documented).
    *
    * Scale shape: the self-join expands each item into its annotator
    * pairs (Σ per-item k², the standard blocked quadratic — the item
    * IS the block); per-pair label-cross masses are two hash
    * aggregates off that pair stream. `minShared` prunes the long tail
    * of incidental pairs before output.
    *
    * Output: (a1, a2, n_shared, n_agree, pe_num, kappa_e6), a1 < a2. */
  def pairwiseKappaE6(votes: DataFrame, item: Column, annotator: Column,
      label: Column, minShared: Long = 1L): DataFrame = {
    val v = votes.select(item.as("i"), annotator.as("a"),
        label.cast("string").as("l"))
      .where(col("i").isNotNull && col("a").isNotNull && col("l").isNotNull)
      .groupBy(col("i"), col("a")).agg(min(col("l")).as("l"))
    val pairs = v.as("x").join(v.as("y"),
        col("x.i") === col("y.i") && col("x.a") < col("y.a"))
      .select(col("x.a").as("a1"), col("y.a").as("a2"),
        col("x.l").as("l1"), col("y.l").as("l2"))
    val base = pairs.groupBy(col("a1"), col("a2"))
      .agg(count(lit(1)).as("n_shared"),
        sum(when(col("l1") === col("l2"), 1L).otherwise(0L)).as("n_agree"))
      .where(col("n_shared") >= minShared)
    val c1 = pairs.groupBy(col("a1"), col("a2"), col("l1").as("l"))
      .agg(count(lit(1)).as("c1"))
    val c2 = pairs.groupBy(col("a1"), col("a2"), col("l2").as("l"))
      .agg(count(lit(1)).as("c2"))
    val pe = c1.join(c2, Seq("a1", "a2", "l"))
      .groupBy(col("a1"), col("a2"))
      .agg(sum(expr("CAST(c1 AS DECIMAL(38,0)) * c2")).as("pe_num"))
    base.join(pe, Seq("a1", "a2"))
      .select(col("a1"), col("a2"), col("n_shared"), col("n_agree"),
        col("pe_num"),
        expr("""CASE WHEN CAST(n_shared AS DECIMAL(38,0)) * n_shared
               |   = pe_num THEN NULL
               | ELSE CAST((CAST(n_agree AS DECIMAL(38,0)) * n_shared
               |    - pe_num) * 1000000
               |  div (CAST(n_shared AS DECIMAL(38,0)) * n_shared
               |    - pe_num) AS BIGINT) END""".stripMargin)
          .as("kappa_e6"))
  }

  def bradleyTerryTiesE6(duels: DataFrame, itemA: Column, itemB: Column,
      outcome: Column, thetaE6: Long, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 16)
    require(thetaE6 > 1000000L && thetaE6 <= 100000000L,
      s"thetaE6=$thetaE6 must be in (1e6, 1e8] — Rao–Kupper needs θ > 1")
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cmp = duels
      .select(itemA.as("x"), itemB.as("y"), outcome.cast("int").as("o"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        col("x") =!= col("y") && col("o").isin(1, -1, 0))
    // unordered-pair sufficient statistics: a < b, a's wins / b's wins /
    // ties — the only pass over raw duels
    val und = cmp
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"),
        // outcome re-expressed relative to the (a, b) ordering
        when(col("o") === 0, lit(0))
          .when((col("x") < col("y")) === (col("o") === 1), lit(1))
          .otherwise(lit(-1)).as("oa"))
      .groupBy(col("a"), col("b"))
      .agg(sum(when(col("oa") === 1, 1L).otherwise(0L)).as("wab"),
        sum(when(col("oa") === -1, 1L).otherwise(0L)).as("wba"),
        sum(when(col("oa") === 0, 1L).otherwise(0L)).as("tab"))
      .persist(mem)
    val side = und.select(col("a").as("id"), col("wab").as("w"),
        col("tab").as("t"), (col("wab") + col("wba") + col("tab")).as("n"))
      .unionByName(und.select(col("b").as("id"), col("wba").as("w"),
        col("tab").as("t"), (col("wab") + col("wba") + col("tab")).as("n")))
    val items = side.groupBy(col("id"))
      .agg(sum(col("w")).as("wins"), sum(col("t")).as("ties"),
        sum(col("n")).as("comparisons"))
      .persist(mem)
    val nItems = items.count()
    var r = items.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iterations) {
      val terms = und
        .join(maybeBroadcast(
          r.select(col("id").as("a"), col("r").as("ra")), nItems), "a")
        .join(maybeBroadcast(
          r.select(col("id").as("b"), col("r").as("rb")), nItems), "b")
        // θ-scaled opposing ratings; DECIMAL(38,0) term pair so heavy
        // pairs can't wrap (HUGEINT replays exactly)
        .withColumn("tra", expr(s"$thetaE6 * ra div 1000000"))
        .withColumn("trb", expr(s"$thetaE6 * rb div 1000000"))
        .withColumn("da", expr(
          s"""CAST(wab + tab AS DECIMAL(38,0)) * 1000000000000
             |  div (ra + trb)
             |+ CAST(wba + tab AS DECIMAL(38,0)) * $thetaE6 * 1000000
             |  div (rb + tra)""".stripMargin))
        .withColumn("db", expr(
          s"""CAST(wba + tab AS DECIMAL(38,0)) * 1000000000000
             |  div (rb + tra)
             |+ CAST(wab + tab AS DECIMAL(38,0)) * $thetaE6 * 1000000
             |  div (ra + trb)""".stripMargin))
      val denom = terms.select(col("a").as("id"), col("da").as("d"))
        .unionByName(terms.select(col("b").as("id"), col("db").as("d")))
        .groupBy(col("id"))
        .agg(sum(col("d").cast("decimal(38,0)")).as("dd"))
      // Same single-materialization renorm as [[bradleyTerryE6]] (r15
      // optimization round): the round subtree runs once, not twice.
      // Lazy since r16 — the max job materializes the blocks (see
      // bradleyTerryE6).
      val rawCp = items.join(denom, Seq("id"))
        .select(col("id"), greatest(lit(1L),
          expr("CAST(CAST(wins + ties AS DECIMAL(38,0)) * 1000000000000" +
            " div dd AS BIGINT)")).as("r"))
        .truncate(false)
      val m = rawCp.agg(max(col("r")).as("m"))
      r = rawCp.crossJoin(broadcast(m))
        .select(col("id"),
          greatest(lit(1L), expr("r * 1000000 div m")).as("r"))
    }
    val out = items.join(r, Seq("id"))
      .select(col("id").as("item"), col("r").as("rating_e6"),
        col("wins"), col("ties"), col("comparisons"))
      .truncate(true)
    und.unpersist()
    items.unpersist()
    out
  }

  /** Win ratio for hierarchical composite endpoints (Pocock et al.
    * 2012): every treated×control pair compares first on the PRIMARY
    * outcome (bad event: treated wins iff only the control had it),
    * falling through to the SECONDARY integer outcome on primary
    * ties — the clinical-trials shape that maps directly onto
    * preference data (primary = hard fail, secondary = graded score).
    *
    *   win_ratio_e6 = wins·1e6 div losses    (NULL when losses = 0)
    *
    * The nt·nc pairwise counts NEVER materialize pairs: both arms
    * collapse to (bad, secondary) cell censuses (bounded by the
    * outcome domains — the caller buckets a continuous secondary),
    * and the census×census join carries domain², not data². Products
    * widen to DECIMAL(38,0); counts are emitted exactly so the
    * consumer can re-derive any ratio.
    *
    * Output one row: (n_treated, n_control, wins, losses, ties,
    * win_ratio_e6 — counts DECIMAL). */
  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement when a
    * FIXED number m of (interchangeable) raters label every item: the
    * missing middle between Cohen's κ (exactly 2 fixed raters, q249)
    * and Krippendorff's α (arbitrary incomplete designs, q338).
    *
    * With per-item category counts c_ic (Σ_c c_ic = m), N complete
    * items, and category marginals s_c = Σ_i c_ic:
    *
    *   P̄  = Σᵢ(Σ_c c²_ic − m) / (N·m·(m−1))
    *   P̄e = Σ_c s²_c / (N·m)²
    *   κ  = (P̄ − P̄e) / (1 − P̄e)
    *
    * computed as ONE exact cross-multiplied ratio (S1 = N·m(m−1),
    * S2 = (Nm)²):  κ_e6 = (pbar_num·S2 − pe_num·S1)·1e6
    * div (S1·(S2 − pe_num)) — truncating toward zero (κ can be
    * negative), all products DECIMAL(38,0). Items with a rater count
    * ≠ m are EXCLUDED and counted (n_dropped) — Fleiss requires the
    * complete design; silently padding would fake agreement.
    *
    * Scale shape: one (item, category) hash aggregate, one item
    * census aggregate, one category-marginal aggregate — nothing
    * beyond the label censuses. Output one row: (n_items, m,
    * n_dropped, pbar_e6, pe_e6, kappa_e6). */
  /** Shared census build for the multi-rater agreement family: ONE
    * pass from the raw votes to an eagerly-materialized
    * (i, c, cc, nr) cell frame — cc the per-(item, category) vote
    * count, nr the item's total votes (completeness flag vs m rides
    * every row). The r15 optimization-round finding: the previous
    * shape checkpointed `complete` and `cells` separately and fed a
    * third, UNcheckpointed copy of the votes subtree to the
    * `n_dropped` broadcast, so the caller's scan + window ran 3× per
    * coefficient (q409/q452 each ~5 s warm for a census-grain op).
    * The whole chain groupBy(i,r) → groupBy(i,c) → window(i) needs
    * ZERO exchanges when the caller's frame is already hash(i)
    * partitioned (the gates' top-3 window guarantees it), and the
    * single checkpoint feeds every downstream aggregate. */
  private def agreementCells(df: DataFrame, item: Column, rater: Column,
      category: Column): DataFrame = {
    val votes = df.select(item.as("i"), rater.as("r"),
        category.as("c"))
      .where(col("i").isNotNull && col("r").isNotNull &&
        col("c").isNotNull)
      .groupBy(col("i"), col("r")).agg(min(col("c")).as("c"))
    votes.groupBy(col("i"), col("c")).agg(count(lit(1)).as("cc"))
      .withColumn("nr", sum(col("cc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("i"))))
      .truncate(true) // item stats, marginals, dropped all read it
  }

  def fleissKappaE6(df: DataFrame, item: Column, rater: Column,
      category: Column, raters: Int): DataFrame = {
    require(raters >= 2 && raters <= 1000,
      s"Preference.fleissKappaE6: need 2 ≤ raters ≤ 1000, got $raters")
    val m = raters.toLong
    val cells = agreementCells(df, item, rater, category)
    // per-item then global: n / pbar_num over complete items plus the
    // dropped census in ONE aggregate chain (no second scan)
    val itemStats = cells.groupBy(col("i"))
      .agg(max(col("nr")).as("nr"), sum(expr("cc * cc")).as("sq"))
      .agg(coalesce(sum(when(col("nr") === m, 1L)), lit(0L)).as("n"),
        sum(when(col("nr") === m,
          expr(s"CAST(sq - $m AS DECIMAL(38,0))"))).as("pbar_num"),
        coalesce(sum(when(col("nr") =!= m, 1L)), lit(0L))
          .as("n_dropped"))
    val margStats = cells.where(col("nr") === m).groupBy(col("c"))
      .agg(sum(col("cc")).as("sc"))
      .agg(sum(expr("CAST(sc AS DECIMAL(38,0)) * sc")).as("pe_num"))
    itemStats.crossJoin(broadcast(margStats))
      .withColumn("__s1", expr(s"CAST(n AS DECIMAL(38,0)) * $m * ${m - 1}"))
      .withColumn("__s2", expr(
        s"CAST(n AS DECIMAL(38,0)) * $m * n * $m"))
      .select(col("n").as("n_items"), lit(m).as("m"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        expr("CAST(pbar_num * 1000000 div __s1 AS BIGINT)")
          .as("pbar_e6"),
        expr("CAST(pe_num * 1000000 div __s2 AS BIGINT)").as("pe_e6"),
        when(expr("__s2 - pe_num") > 0L, expr(
          """CAST((pbar_num * __s2 - pe_num * __s1) * 1000000
            |div (__s1 * (__s2 - pe_num)) AS BIGINT)""".stripMargin))
          .as("kappa_e6"))
  }

  /** Gwet's AC1 first-order agreement coefficient (Gwet 2008, the
    * paradox-resistant alternative to κ: under skewed category
    * prevalence κ collapses while raters plainly agree — the "high
    * agreement, low kappa" trap an annotation QA dashboard must not
    * fall into). Same complete-design multi-rater input as
    * [[fleissKappaE6]]; same observed agreement P̄; the chance term is
    *
    *   Pe(AC1) = (1/(Q−1)) · Σ_q π_q(1−π_q),  π_q = s_q/(N·m)
    *
    * over the Q OBSERVED categories. Exact cross-multiplied ratio
    * (A = pbar numerator, S1 = N·m(m−1), C = Σ s_q(Nm − s_q),
    * D = (Q−1)(Nm)²):  ac1_e6 = (A·D − C·S1)·1e6 div (S1·(D − C)),
    * truncating toward zero; NULL when Q < 2 (chance agreement
    * undefined over one category). Output one row: (n_items, m,
    * q_cats, n_dropped, pbar_e6, pe_e6, ac1_e6).
    *
    * Scale shape: identical to [[fleissKappaE6]] — label censuses
    * only. */
  def gwetAc1E6(df: DataFrame, item: Column, rater: Column,
      category: Column, raters: Int): DataFrame = {
    require(raters >= 2 && raters <= 1000,
      s"Preference.gwetAc1E6: need 2 ≤ raters ≤ 1000, got $raters")
    val m = raters.toLong
    val cells = agreementCells(df, item, rater, category)
    val itemStats = cells.groupBy(col("i"))
      .agg(max(col("nr")).as("nr"), sum(expr("cc * cc")).as("sq"))
      .agg(coalesce(sum(when(col("nr") === m, 1L)), lit(0L)).as("n"),
        sum(when(col("nr") === m,
          expr(s"CAST(sq - $m AS DECIMAL(38,0))"))).as("a"),
        coalesce(sum(when(col("nr") =!= m, 1L)), lit(0L))
          .as("n_dropped"))
    val margStats = cells.where(col("nr") === m).groupBy(col("c"))
      .agg(sum(col("cc")).as("sc"))
      .agg(count(lit(1)).as("q_cats"),
        sum(col("sc").cast("decimal(38,0)")).as("__p"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * sc")).as("__s2"))
      .select(col("q_cats"),
        // C = Σ s_q(P − s_q) = P·Σs − Σs² = P² − Σs²  (Σs = P)
        expr("__p * __p - __s2").as("cterm"), col("__p").as("p"))
    itemStats.crossJoin(broadcast(margStats))
      .withColumn("__s1", expr(s"CAST(n AS DECIMAL(38,0)) * $m * ${m - 1}"))
      .withColumn("__d", expr("CAST(q_cats - 1 AS DECIMAL(38,0)) * p * p"))
      .select(col("n").as("n_items"), lit(m).as("m"), col("q_cats"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        expr("CAST(a * 1000000 div __s1 AS BIGINT)").as("pbar_e6"),
        when(col("q_cats") >= 2L,
          expr("CAST(cterm * 1000000 div __d AS BIGINT)")).as("pe_e6"),
        when(col("q_cats") >= 2L && expr("__d - cterm") > 0L, expr(
          """CAST((a * __d - cterm * __s1) * 1000000
            |div (__s1 * (__d - cterm)) AS BIGINT)""".stripMargin))
          .as("ac1_e6"))
  }

  /** One-way random-effects intraclass correlation ICC(1) (Shrout &
    * Fleiss 1979's ICC(1,1); Fisher's original ANOVA form) — the
    * RELIABILITY of continuous ratings where [[fleissKappaE6]]/
    * [[gwetAc1E6]] cover categorical ones: n targets each scored by k
    * interchangeable raters,
    *
    *   ICC = (MSB − MSW) / (MSB + (k−1)·MSW)
    *       = (U(k−1) − V(n−1)) div ((k−1)·(U + (n−1)·V))
    *
    * with U = n·ΣT² − G² and V = k·Σx² − ΣT² (T = per-target sum,
    * G = grand sum) — the cleared-denominator identity makes the
    * whole coefficient ONE exact integer ratio (toward-zero on the
    * possibly-negative numerator). Targets with a rating count ≠ k
    * drop and are counted. Domain: |values|·√(n·k) must keep n·ΣT²
    * under 1e38 — integer scores and cents-grain values are fine at
    * warehouse scale.
    *
    * Scale shape: one (target) hash aggregate, one global aggregate.
    * Output one row: (n_targets, k, n_dropped, icc_e6). */
  def iccOneWayE6(df: DataFrame, target: Column, value: Column,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 1000,
      s"Preference.iccOneWayE6: need 2 ≤ k ≤ 1000, got $k")
    val base = df.select(target.as("i"), value.cast("long").as("x"))
      .where(col("i").isNotNull && col("x").isNotNull)
    val per = base.groupBy(col("i"))
      .agg(count(lit(1)).as("nr"), sum(col("x")).as("t"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("xx"))
      .truncate(true)
    val dropped = per.agg(
      sum(when(col("nr") =!= k.toLong, 1L).otherwise(0L)).as("n_dropped"))
    per.where(col("nr") === k.toLong)
      .agg(count(lit(1)).as("n"),
        sum(col("t").cast("decimal(38,0)")).as("g"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * t")).as("tt"),
        sum(col("xx")).as("sxx"))
      .crossJoin(broadcast(dropped))
      .withColumn("u", expr("n * tt - g * g"))
      .withColumn("v", expr(s"$k * sxx - tt"))
      .select(col("n").as("n_targets"), lit(k.toLong).as("k"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        when(expr(s"(${k - 1}) * (u + (n - 1) * v)") > 0L, expr(
          s"""CAST((u * ${k - 1} - v * (n - 1)) * 1000000
             |div (${k - 1} * (u + (n - 1) * v)) AS BIGINT)"""
            .stripMargin)).as("icc_e6"))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1) at TASK GRAIN — the per-task
    * companion of [[EvalCurves.passAtKCurve]] (which aggregates the
    * mean curve over k; this returns the task-level table an eval
    * dashboard drills into). Per task with n samples of which c
    * pass,
    *   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − ∏_{i=0..k−1} (n−c−i)/(n−i)
    * computed EXACTLY in integers: numerator and denominator are k-term
    * consecutive-integer products (k is a plan constant, unrolled) in
    * DECIMAL(38,0), then
    *   pass_e6 = 1e6 − (1e6·num) div den    (truncating; operands ≥ 0).
    * The numerator product needs no C(n−c,k)=0 case split: its k terms
    * are consecutive descending integers, so n−c < k puts a literal 0
    * among them. Tasks with n < k are dropped (the estimator is
    * undefined there) — mirror the HAVING in the oracle.
    *
    * Scale shape: ONE hash aggregate to task grain (map-side combined);
    * the products are scalar projections on the task census. Guard: the
    * counted max(n) must keep 1e6·n^k inside DECIMAL(38,0) — loud
    * require, single-row fetch. */
  def passAtKE6(samples: DataFrame, task: Column, correct: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k=$k out of range [1,16]")
    val tasks = samples.groupBy(task.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(when(correct, 1L).otherwise(0L)).as("c"))
      .where(col("n") >= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxN = tasks.agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(maxN == 0L || k * math.log10(maxN.toDouble) <= 30.0,
      s"max samples/task $maxN with k=$k overflows the DECIMAL(38,0) " +
        "product bound (need n^k <= 1e30); reduce k or pre-sample tasks")
    def prod(base: Column): Column =
      (0 until k).map(i => (base - lit(i.toLong))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .reduce(_ * _)
    val out = tasks
      .withColumn("__num", prod(col("n") - col("c")))
      .withColumn("__den", prod(col("n")))
      // `div` (NOT `/`): decimal `/` rounds HALF_UP, div truncates like
      // the oracle's `//`; operands are non-negative
      .withColumn("pass_e6",
        expr("1000000L - (CAST(1000000 AS DECIMAL(38,0)) * __num) div __den"))
      .select(col("task"), col("n"), col("c"), col("pass_e6"))
      .truncate(true)
    tasks.unpersist()
    out
  }

  /** Online Elo ratings — the SEQUENTIAL companion of [[bradleyTerryE6]]
    * (Elo 1978; the zero-sum integer form chess servers run): matches
    * fold in a caller-supplied TOTAL order, and after each match
    *   E_w_e6 = ⌊1e6 / (1 + 10^((r_l − r_w)/400)) + 0.5⌋
    *   d      = (K · (1e6 − E_w_e6)) div 1e6        ∈ [0, K]
    *   r_w += d;  r_l −= d.
    * Ratings are plain integers (start `initialRating`), so the only
    * floating step is ONE pow(10, Δ/400) per match on an INTEGER rating
    * diff — no compounding of doubles, and the ⌊x+0.5⌋ rounding is
    * pinned identically in the SQL replay (`floor(x + 0.5)`), keeping
    * the whole trajectory bit-stable cross-engine (the q374 pow-parity
    * precedent). Zero-sum by construction: the loser loses exactly what
    * the winner gains (the symmetric-E form would need E_l = 1e6 − E_w,
    * which half-point rounding breaks).
    *
    * The fold is inherently sequential GLOBAL state (each update reads
    * both players' current ratings), so it runs on the driver behind a
    * bounded-fetch probe (`limit(max+1)` → loud require) — the MMR/KM
    * contract: at production scale the stream form is
    * [[graft.streaming.EloTws]] (watermark-ordered, same arithmetic;
    * EloTwsSpec pins batch ≡ stream). Output: (player, rating,
    * n_matches) for every player seen. */
  /** Generalized Advantage Estimation with a horizon cap (Schulman et
    * al. 2016, "High-Dimensional Continuous Control Using Generalized
    * Advantage Estimation") — the per-step credit assignment PPO-style
    * RLHF runs, beside [[groupAdvantageE6]]'s GRPO group baseline:
    *   δ_t = r_t + γ·V_{t+1} − V_t        (V beyond the last step = 0)
    *   A_t = Σ_{k=0..H} (γλ)^k · δ_{t+k}  (H = `horizon` truncation —
    *                                       the bounded-window form
    *                                       production stacks ship)
    * Exactness: γ and λ arrive e6; the decay chain is pinned integer:
    * gl = γ_e6·λ_e6 div 1e6, c_0 = 1e6, c_k = c_{k−1}·gl div 1e6, and
    * each term contributes c_k·δ_{t+k} div 1e6 (toward-zero div, signed
    * — both engines truncate toward zero on BIGINT). γ·V_{t+1} is
    * likewise γ_e6·V div 1e6. Rewards/values are integer fixed-point
    * (cents); advantages come back in the same unit.
    *
    * Scale shape: per-TRAJECTORY lead() windows in REAL partitions
    * (trajectory keys — no global window), H+1 lead columns wide; no
    * joins, no iteration. The caller's order columns must totally
    * order each trajectory. */
  def gaeE6(steps: DataFrame, traj: Column, orderBy: Seq[Column],
      reward: Column, value: Column, gammaE6: Long, lambdaE6: Long,
      horizon: Int): DataFrame = {
    require(gammaE6 >= 0L && gammaE6 <= 1000000L, s"gammaE6 $gammaE6")
    require(lambdaE6 >= 0L && lambdaE6 <= 1000000L, s"lambdaE6 $lambdaE6")
    require(horizon >= 0 && horizon <= 16, s"horizon $horizon")
    val glE6 = gammaE6 * lambdaE6 / 1000000L
    val coefs = Iterator.iterate(1000000L)(c => c * glE6 / 1000000L)
      .take(horizon + 1).toSeq
    val base = steps
      .select(traj.as("trajectory") +: orderBy.zipWithIndex.map {
        case (c, i) => c.as(s"__o$i")
      } :+ reward.cast("long").as("r") :+ value.cast("long").as("v"): _*)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("trajectory"))
      .orderBy(orderBy.indices.map(i => col(s"__o$i")): _*)
    val d = base
      .withColumn("__vnext", lead(col("v"), 1, 0L).over(wb))
      .withColumn("delta",
        col("r") + expr(s"($gammaE6 * __vnext) div 1000000") - col("v"))
    val adv = coefs.zipWithIndex.map { case (c, k) =>
      expr(s"($c * %s) div 1000000".format(s"__d$k"))
    }.reduce(_ + _)
    val withLeads = (0 to horizon).foldLeft(d) { (df, k) =>
      df.withColumn(s"__d$k", lead(col("delta"), k, 0L).over(wb))
    }
    withLeads
      .withColumn("advantage", adv)
      .select(col("trajectory") +:
        orderBy.indices.map(i => col(s"__o$i").as(s"o$i")) :+
        col("r").as("reward") :+ col("v").as("value") :+
        col("delta") :+ col("advantage"): _*)
  }

  /** One Elo update's zero-sum transfer: what the winner at `rw` gains
    * (and the loser at `rl` loses) — shared by the batch fold and
    * [[graft.streaming.EloTws]] so batch ≡ stream holds by
    * construction, not by parallel maintenance. */
  private[graft] def eloDelta(rw: Long, rl: Long, kFactor: Long): Long = {
    val eE6 = math.floor(
      1000000.0 / (1.0 + math.pow(10.0, (rl - rw).toDouble / 400.0)) + 0.5)
      .toLong
    (kFactor * (1000000L - eE6)) / 1000000L
  }

  def eloRatings(matches: DataFrame, playerA: Column, playerB: Column,
      aWins: Column, orderBy: Seq[Column], kFactor: Long = 32L,
      initialRating: Long = 1500L, maxMatches: Long = 20000L): DataFrame = {
    require(kFactor > 0L && maxMatches > 0L)
    val spark = matches.sparkSession
    val sel = matches.select((playerA.cast("long").as("pa") +:
      playerB.cast("long").as("pb") +: aWins.as("aw") +:
      orderBy.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }): _*)
      .where(col("pa").isNotNull && col("pb").isNotNull &&
        col("pa") =!= col("pb"))
    require(sel.limit((maxMatches + 1L).toInt).count() <= maxMatches,
      s"eloRatings is a bounded driver fold: > $maxMatches matches — " +
        "use the EloTws streaming form at this scale")
    val ordered = sel
      .orderBy(orderBy.indices.map(i => col(s"__o$i")): _*)
      .select(col("pa"), col("pb"), col("aw"))
      .collect()
    val r = scala.collection.mutable.Map.empty[Long, Long]
    val nm = scala.collection.mutable.Map.empty[Long, Long]
    ordered.foreach { row =>
      val (pa, pb, aw) = (row.getLong(0), row.getLong(1), row.getBoolean(2))
      val (w, l) = if (aw) (pa, pb) else (pb, pa)
      val rw = r.getOrElse(w, initialRating)
      val rl = r.getOrElse(l, initialRating)
      val d = eloDelta(rw, rl, kFactor)
      r(w) = rw + d
      r(l) = rl - d
      nm(w) = nm.getOrElse(w, 0L) + 1L
      nm(l) = nm.getOrElse(l, 0L) + 1L
    }
    import spark.implicits._
    r.toSeq.sortBy(_._1)
      .map { case (p, rating) => (p, rating, nm(p)) }
      .toDF("player", "rating", "n_matches")
  }

  def winRatioE6(df: DataFrame, treated: Column, primaryBad: Column,
      secondary: Column): DataFrame = {
    val cells = df.select(treated.cast("boolean").as("tr"),
        primaryBad.cast("boolean").as("bad"),
        secondary.cast("long").as("sec"))
      .where(col("tr").isNotNull && col("bad").isNotNull &&
        col("sec").isNotNull)
      .groupBy(col("tr"), col("bad"), col("sec"))
      .agg(count(lit(1)).as("n"))
      .truncate(true) // both arms read the census
    val t = cells.where(col("tr")).select(col("bad").as("tb"),
      col("sec").as("ts"), col("n").as("nt"))
    val c = cells.where(!col("tr")).select(col("bad").as("cb"),
      col("sec").as("cs"), col("n").as("nc"))
    val d = (x: Column) => x.cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    t.crossJoin(c)
      .agg(
        coalesce(sum(when((!col("tb") && col("cb")) ||
            (col("tb") === col("cb") && col("ts") > col("cs")),
          d(col("nt")) * col("nc"))), zero).as("wins"),
        coalesce(sum(when((col("tb") && !col("cb")) ||
            (col("tb") === col("cb") && col("ts") < col("cs")),
          d(col("nt")) * col("nc"))), zero).as("losses"),
        coalesce(sum(when(col("tb") === col("cb") &&
            col("ts") === col("cs"),
          d(col("nt")) * col("nc"))), zero).as("ties"))
      .crossJoin(broadcast(
        t.agg(coalesce(sum(col("nt")), lit(0L)).as("n_treated"))))
      .crossJoin(broadcast(
        c.agg(coalesce(sum(col("nc")), lit(0L)).as("n_control"))))
      .select(col("n_treated"), col("n_control"), col("wins"),
        col("losses"), col("ties"),
        when(col("losses") > 0L,
          expr("CAST(wins * 1000000 div losses AS BIGINT)"))
          .as("win_ratio_e6"))
  }
}
