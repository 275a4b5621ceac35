package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{ContentMetrics, Windows}
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators._
import graft.schema.{DeliveryLogLite, JoinSideEvent, ScopedEvent}
import graft.streaming.{CombineDeliveryLog, InferredJoin}
import GateSupport._
import CatalogDefs._

/** Experimentation + causal: cuped, uplift, did, ips/dr, raking, power, mixtures, valuation.
  *
  * 35 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object ExperimentGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Corpus prep: EXACT-proportion stratified split (complement of q44's
    // stable hash split) — within every language exactly ⌊8n/10⌋ train /
    // next ⌊9n/10⌋−⌊8n/10⌋ val / rest test, ranked by (PolyHash64, id),
    // integer thresholds only.
    "q68_stratified_split" -> ((s, dir) =>
      operators.CorpusOps.stratifiedSplit(t(s, dir, "documents"),
        "doc_id", "lang", Seq("train" -> 8L, "val" -> 1L, "test" -> 1L))),

    // Corpus prep: weighted reservoir sampling (Efraimidis–Spirakis A-ES)
    // — 20 docs per language, length-weighted, hash-uniforms instead of
    // rand() so the draw is stable across runs/engines/partitionings;
    // the ranked window pushes a partial top-k below the exchange.
    "q73_weighted_sample" -> ((s, dir) =>
      operators.CorpusOps.weightedSample(t(s, dir, "documents"),
        "doc_id", "lang", "n_chars", "#ws#v1", k = 20)),

    // DSIR importance weights: hashed-token (B=1024) distributions for
    // target (English slice) vs raw (whole corpus); every document gets
    // the summed log importance ratio + a total-ordered rank.
    "q101_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Dsir.importanceWeights(docs.where(col("lang") === "en"),
        docs, docs, "doc_id", "text", buckets = 1024)
    }),

    // Last-touch attribution (J4 at metric level): every purchase credits
    // the user's latest STRICTLY-earlier click within 7 days — one
    // user-key window pass (range frame, no self-join), tie-broken to the
    // smallest click id.
    "q110_attribution" -> ((s, dir) =>
      operators.Attribution.lastTouch(
        ev(s, dir).select(col("user_id"), col("event_id"),
          col("ts_ms"), col("event_type")),
        "user_id", "event_id", "ts_ms", "event_type",
        touchType = "click", convType = "purchase",
        lookbackMs = 7L * 86400000L)),

    // Linear multi-touch attribution: every click in the 7d lookback
    // shares the purchase's credit equally in exact ppm (truncation
    // remainder to the latest touch, so shares sum to 1e6 per purchase).
    // Pair set via the bucketed interval join (skew lever), one window.
    "q111_linear_attribution" -> ((s, dir) =>
      operators.Attribution.linearTouch(
        ev(s, dir).select(col("user_id"), col("event_id"),
          col("ts_ms"), col("event_type")),
        "user_id", "event_id", "ts_ms", "event_type",
        touchType = "click", convType = "purchase",
        lookbackMs = 7L * 86400000L)),

    // Position-based (U-shaped 40/20/40) multi-touch attribution — the
    // third credit rule on the q110/q111 pair machinery, remainder to
    // the last touch so shares sum to exactly 1e6.
    "q147_position_attribution" -> ((s, dir) =>
      operators.Attribution.positionTouch(
        ev(s, dir).select(col("user_id"), col("event_id"),
          col("ts_ms"), col("event_type")),
        "user_id", "event_id", "ts_ms", "event_type",
        touchType = "click", convType = "purchase",
        lookbackMs = 7L * 86400000L)),

    // Wilson-score quality gate: per-source pass rate (quality ≥ 75)
    // with the statistically honest LOWER confidence bound — small
    // samples can't sneak through on a lucky point rate. Pinned IEEE
    // chain incl. correctly-rounded sqrt; one counting aggregation.
    "q129_wilson_gate" -> ((s, dir) =>
      operators.Profile.wilsonLowerBound(
        t(s, dir, "documents").select(col("source"),
          TextFunctions.qualityScore(col("text")).as("q")),
        "source", col("q") >= 75L)),

    // Perplexity curriculum: bigram-LM difficulty scores (q100's exact
    // pipeline) cut into quartiles by the equi-depth machinery — the
    // easy→hard staging table of curriculum training. The LM scoring runs
    // once into a persisted frame; the quantile pass and the assignment
    // read it, not the corpus.
    "q122_curriculum" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = operators.NgramLm.perplexityScore(
          docs.where(col("lang") === "en"), docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      operators.ExactQuantiles.equiDepthBins(scored, col("avg_nll_micro"),
          col("doc_id"), buckets = 4, bucketAs = "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_nll_micro")).as("min_nll"),
          max(col("avg_nll_micro")).as("max_nll"))
    }),

    // Temperature-scaled mixture weights (α=0.7, budget 100k docs):
    // per-source shares ∝ n^α — the small-source upweighting recipe. One
    // tiny count aggregate; pow rounds to micro-units before any sum.
    "q104_mixture_weights" -> ((s, dir) =>
      operators.CorpusOps.temperatureWeights(t(s, dir, "documents"),
        "source", alpha = 0.7, budget = 100000L)),

    // Data-driven Shapley channel attribution: each engagement channel's
    // average marginal lift of the purchase rate across all 2^4 exposure
    // coalitions, exact in phi·4!·e6 integer units — the principled
    // complement to last/linear/U-shaped touch (q110/q111/q117).
    // Exposure counts only on each user's assigned day-of-week (at this
    // event density an unrestricted mask saturates to all-channels and
    // the coalition lattice degenerates to one point).
    "q234_shapley" -> ((s, dir) => {
      val e = ev(s, dir)
      val assigned = pmod(expr("ts_ms div 86400000"), lit(7L)) ===
        pmod(col("user_id"), lit(7L))
      val input = e.where(
        (assigned && col("event_type").isin("view", "click", "signup",
          "error")) || col("event_type") === "purchase")
      operators.Attribution.shapleyChannels(input, "user_id", "event_type",
        channels = Seq("view", "click", "signup", "error"),
        convType = "purchase")
    }),

    // Neyman-optimal stratified allocation of a 10k sample budget across
    // event types: n_h ∝ N_h·S_h with an exact integer isqrt (double
    // sqrt corrected by one integer step), quotas via q227's Hamilton
    // apportionment — variance-heavy strata earn more than a uniform
    // rate would give.
    "q235_neyman" -> ((s, dir) =>
      operators.CorpusOps.neymanAllocation(
        t(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents", budget = 10000L)),

    // Difference-in-differences readout: even-id users "treated", the
    // observation window split at its midpoint — four cell means
    // e6-truncated in a pinned order, then pure LONG differences; the
    // sufficient statistics ride along.
    "q238_diff_in_diff" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      operators.Causal.diffInDiff(e.crossJoin(broadcast(mid)),
        treated = pmod(col("user_id"), lit(2L)) === 0L,
        post = col("ts_ms") >= col("mid"),
        outcome = round(col("value") * 100).cast("long"))
    }),

    // Markov-chain removal-effect attribution over pre-first-purchase
    // journeys: first-order transition chain START→touches→CONV/NULL,
    // conversion probability by 8 rounds of e9 value iteration, each
    // channel credited by the drop when its inbound edges redirect to
    // NULL. The oracle unrolls all 5 chains × 8 rounds.
    "q239_markov_removal" -> ((s, dir) =>
      operators.Attribution.markovRemoval(ev(s, dir), "user_id",
        "event_id", "ts_ms", "event_type",
        channels = Seq("view", "click", "signup", "error"),
        convType = "purchase", rounds = 8)),

    // Uplift decile curve: users ranked by total engagement cents and
    // cut into 10 tiles; cumulative treated-vs-control "big spender"
    // (purchase cents ≥ the ~median 59k) rate difference per tile — the
    // Qini evaluation table, exact e6. Unit grain is pre-aggregated so
    // conversion is a USER property, not a row property (a row-level
    // bit saturates to 1.0 at this event density).
    "q240_uplift_curve" -> ((s, dir) => {
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100).cast("long")).as("score_c"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
            .as("pc"))
      operators.Causal.upliftCurve(units, "user_id",
        scoreAgg = max(col("score_c")),
        treated = pmod(col("user_id"), lit(2L)) === 0L,
        converted = col("pc") >= 59000L,
        nTiles = 10)
    }),

    // CUPED variance-reduced lift (the industry A/B readout): each
    // user's post-period spend adjusted by their PRE-period spend with
    // the pooled θ = cov/var — the whole estimate as exact integer
    // ratios over common denominators. q238's split/cohort conventions;
    // completes the experimentation family (DiD, chi², Simpson, Qini).
    "q259_cuped" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      decStr(operators.Causal.cupedAdjustedLift(e.crossJoin(broadcast(mid)),
        unitCol = col("user_id"),
        treated = pmod(col("user_id"), lit(2L)) === 0L,
        pre = col("ts_ms") < col("mid"),
        outcome = round(col("value") * 100).cast("long")))
    }),

    // Post-stratified ATE: pre-period spend bit-length strata remove
    // the scale confound, within-stratum differences reweight by
    // stratum size into the stratum = −1 rollup. q259's split/cohort
    // conventions; ≤64 strata regardless of data size.
    "q262_poststrat_ate" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      operators.Causal.postStratifiedAte(e.crossJoin(broadcast(mid)),
        unitCol = col("user_id"),
        treated = pmod(col("user_id"), lit(2L)) === 0L,
        pre = col("ts_ms") < col("mid"),
        outcome = round(col("value") * 100).cast("long"))
    }),

    // Off-policy evaluation under LOGGED (non-uniform) propensities:
    // SNIPS + doubly-robust for the q265 policy — the production
    // estimator pair when logging wasn't uniform. Propensity is a
    // deterministic e6 column (the estimator consumes it as data).
    "q359_snips_dr" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      decStr(operators.OffPolicy.snipsDr(e.crossJoin(broadcast(mid)),
        segment = pmod(col("user_id"), lit(4L)),
        arm = col("event_type"),
        reward = round(col("value") * 100).cast("long"),
        propensityPpm = lit(100000L) + pmod(col("event_id"), lit(5L))
          * lit(150000L),
        isTrain = col("ts_ms") < col("mid")))
    }),

    // Off-policy evaluation: learn a per-segment argmax policy on the
    // first half, score it on the second via replay + uniform-K IPS —
    // counterfactual "what would this targeting have earned" from logs.
    "q265_replay_ips" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      operators.OffPolicy.replayIps(e.crossJoin(broadcast(mid)),
        segment = pmod(col("user_id"), lit(4L)),
        arm = col("event_type"),
        reward = round(col("value") * 100).cast("long"),
        isTrain = col("ts_ms") < col("mid"), nArms = 5)
    }),

    // Quantile treatment effects: the DISTRIBUTIONAL readout the mean
    // lift (q259/q262) hides — exact per-arm quantiles at five percents
    // via ExactQuantiles' sample-then-refine selection, differenced
    // into QTE(p). Heterogeneity shows as a non-constant qte column.
    "q285_qte" -> ((s, dir) => {
      val e = ev(s, dir).where(col("value").isNotNull)
        .withColumn("arm", when(pmod(col("user_id"), lit(2L)) === 0L,
          "treated").otherwise("control"))
      val q = operators.ExactQuantiles.quantiles(e, Seq("arm"),
        round(col("value") * 100).cast("long"), col("event_id"),
        percents = Seq(10, 25, 50, 75, 90))
      q.where(col("arm") === "treated")
        .select(col("percent"), col("quantile").as("q_treated"))
        .join(q.where(col("arm") === "control")
          .select(col("percent"), col("quantile").as("q_control")),
          Seq("percent"))
        .withColumn("qte", col("q_treated") - col("q_control"))
    }),

    // Covariate balance audit: standardized mean differences over
    // PRE-period covariates (spend, activity, breadth) between arms —
    // THE applied-causal diagnostic (|SMD| < 0.1 = balanced). Exact
    // integer pipeline: cross-multiplied mean gaps, truncated sample
    // variances, q235's corrected integer isqrt for the pooled SD.
    "q286_balance_audit" -> ((s, dir) => {
      val e = ev(s, dir)
      val mid = e.agg(min(col("ts_ms")).as("mn"), max(col("ts_ms")).as("mx"))
        .select(expr("(mn + mx) div 2").as("mid"))
      val u = e.crossJoin(broadcast(mid))
        .where(col("ts_ms") < col("mid") && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(pmod(col("user_id"), lit(2L)) === 0L, 1L)
          .otherwise(0L)).as("t"),
          sum(round(col("value") * 100).cast("long")).as("x_spend"),
          count(lit(1)).as("x_events"),
          countDistinct(col("event_type")).as("x_breadth"))
      val cells = u.select(col("t"), expr(
        """stack(3, 'pre_spend', x_spend, 'pre_events', x_events,
           |'pre_breadth', x_breadth) AS (covariate, x)""".stripMargin))
      cells.groupBy(col("covariate"))
        .agg(sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("t") =!= 1L, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("t") === 1L, col("x")).otherwise(0L)).as("__st"),
          sum(when(col("t") =!= 1L, col("x")).otherwise(0L)).as("__sc"),
          sum(when(col("t") === 1L,
            expr("CAST(x AS DECIMAL(38,0)) * x")).otherwise(
            expr("CAST(0 AS DECIMAL(38,0))"))).as("__sst"),
          sum(when(col("t") =!= 1L,
            expr("CAST(x AS DECIMAL(38,0)) * x")).otherwise(
            expr("CAST(0 AS DECIMAL(38,0))"))).as("__ssc"))
        .withColumn("mean_diff_e6", expr(
          """CAST((CAST(__st AS DECIMAL(38,0)) * n_c
             - CAST(__sc AS DECIMAL(38,0)) * n_t) * 1000000
            div CAST(n_t * n_c AS DECIMAL(38,0)) AS BIGINT)"""))
        .withColumn("__vt", expr(
          """CAST((n_t * __sst - CAST(__st AS DECIMAL(38,0)) * __st)
            div CAST(n_t * (n_t - 1) AS DECIMAL(38,0)) AS BIGINT)"""))
        .withColumn("__vc", expr(
          """CAST((n_c * __ssc - CAST(__sc AS DECIMAL(38,0)) * __sc)
            div CAST(n_c * (n_c - 1) AS DECIMAL(38,0)) AS BIGINT)"""))
        .withColumn("__pool", expr("(__vt + __vc) div 2"))
        .withColumn("__s0",
          floor(sqrt(col("__pool").cast("double"))).cast("long"))
        .withColumn("sd", expr(
          """CASE WHEN __s0 * __s0 > __pool THEN __s0 - 1
             WHEN (__s0 + 1) * (__s0 + 1) <= __pool THEN __s0 + 1
             ELSE __s0 END"""))
        .withColumn("smd_e4", when(col("sd") > 0,
          expr("mean_diff_e6 div (sd * 100)")))
        .select(col("covariate"), col("n_t"), col("n_c"),
          col("mean_diff_e6"), col("sd"), col("smd_e4"))
    }),

    // Feature engineering: leave-one-out + prior-smoothed target
    // encoding of order priority against order value — per-row integer
    // codes (the leakage-safe categorical transform), rolled up to
    // per-category checksums so the gate output stays bounded.
    "q298_target_encode" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .where(col("o_totalprice").isNotNull)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      operators.TargetEncode.looMeanE6(o, "o_orderpriority", "cents",
          priorWeight = 20L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("loo_e6") % 1000003L).as("loo_check"),
          min(col("loo_e6")).as("loo_min"),
          max(col("loo_e6")).as("loo_max"),
          sum(col("smooth_e6") % 1000003L).as("smooth_check"))
    }),

    // Effective sample size (Kish): how many unweighted rows each
    // source's revenue-weighted lineitems are worth — ESS ≪ n flags
    // weight collapse in importance-sampled data.
    "q361_ess" -> ((s, dir) =>
      decStr(operators.CorpusOps.effectiveSampleSize(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            cents(col("l_extendedprice")).as("wt")),
        "l_returnflag", "wt"))),

    // Survey raking / IPF (Deming–Stephan): the acctbal>0 "responder"
    // sample re-weighted so its nation and market-segment margins match
    // the FULL customer population — 3 pinned rows-then-columns rounds
    // on the (nation × segment) cell census, e6 integer weights. The
    // oracle unrolls all six scaling steps in HUGEINT.
    "q381_raking" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val sample = c.where(col("c_acctbal") > 0.0)
      val rowT = c.groupBy(col("c_nationkey").cast("long").as("rk"))
        .agg(count(lit(1)).as("rt"))
      val colT = c.groupBy(col("c_mktsegment").as("ck"))
        .agg(count(lit(1)).as("ctg"))
      operators.Raking.rakeE6(sample,
          col("c_nationkey").cast("long"), col("c_mktsegment"),
          rowT, colT, rounds = 3)
        .select(col("rk").as("nation"), col("ck").as("segment"),
          col("n"), col("w_e6"))
    }),

    // Log-log price elasticity of demand per part brand: exact OLS
    // sufficient statistics over e3-integerized ln(price), ln(qty)
    // (pinned-double ln, q100 rule), quadratic forms in DECIMAL —
    // the econ readout a pricing pipeline fits nightly.
    "q399_price_elasticity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          round(col("l_quantity")).cast("long").as("qty"))
      val pt = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          cents(col("p_retailprice")).as("pc"))
      val j = li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("CAST(round(ln(CAST(pc AS DOUBLE)) * 1000.0) AS BIGINT)")
            .as("x"),
          expr("CAST(round(ln(CAST(qty AS DOUBLE)) * 1000.0) AS BIGINT)")
            .as("y"))
      decStr(j.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("__sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("__sxx"))
        .withColumn("slope_num",
          expr("n * __sxy - CAST(sum_x AS DECIMAL(38,0)) * sum_y"))
        .withColumn("slope_den",
          expr("n * __sxx - CAST(sum_x AS DECIMAL(38,0)) * sum_x"))
        .select(col("p_brand"), col("n"), col("sum_x"), col("sum_y"),
          col("slope_num"), col("slope_den"),
          when(col("slope_den") > 0L,
            expr("CAST(slope_num * 1000000 div slope_den AS BIGINT)"))
            .as("elasticity_e6")))
    }),

    // Empirical-Bayes beta-binomial smoothing of per-part return
    // rates: MoM prior over the part census pulls thin-data rates
    // toward the population — the CTR-smoothing recipe, exact.
    "q413_eb_smoothing" -> ((s, dir) => {
      val parts = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("x"), count(lit(1)).as("n"))
      operators.EmpiricalBayes.betaBinomialSmooth(parts,
        col("l_partkey"), col("x"), col("n"), topK = 10)
    }),

    // Laspeyres / Paasche / Fisher price indices, 1995 → 1996, over
    // the matched part basket (unit-value prices) — the index-number
    // summary a marketplace publishes; Fisher via corrected isqrt.
    "q416_price_index" -> ((s, dir) => {
      def year(y: Int) = t(s, dir, "lineitem")
        .where(org.apache.spark.sql.functions.year(
          col("l_shipdate")) === y)
        .withColumn("__vc", cents(col("l_extendedprice")))
        .withColumn("__q", round(col("l_quantity")).cast("long"))
      operators.PriceIndex.bilateralE6(year(1995), year(1996),
        col("l_partkey"), col("__vc"), col("__q"))
    }),

    // DoReMi-shape mixture reweighting (Xie et al. 2023): per-source
    // excess loss = KL(source unigram ‖ corpus unigram) in q374-pinned
    // micro-nats, then 3 linearized multiplicative-weights rounds
    // (η = 0.5) that boost hard/under-served sources — the data-mixture
    // planner's OUTPUT table beside q374's similarity readout; rounds
    // run on the |sources| frame, never tokens.
    "q424_doremi_mixture" -> ((s, dir) =>
      operators.Mixture.doremiWeightsE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("v")),
        col("source"), col("v"), rounds = 3, etaE6 = 500000L)
        .withColumnRenamed("domain", "source")),

    // UniMax epoch-capped allocation (Chung et al. 2023) — the OTHER
    // mixture planner beside q424's DoReMi: a 60k-token budget spread
    // as uniformly as the 2.5-epoch cap allows over per-source token
    // counts, by exact-integer waterfill (two windows over the source
    // census — capped prefix, then R div m with the pinned remainder
    // rule). alloc/epochs/budget-share per source, all truncating.
    "q439_unimax_mixture" -> ((s, dir) =>
      operators.Mixture.unimaxAllocationE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("v")),
        col("source"), budget = 60000L, maxEpochsE6 = 2500000L)
        .withColumnRenamed("domain", "source")),

    // Temperature-sampled mixture weights (mT5's α-scaled sampling,
    // α = 0.5) over the same source/token census — the third shipped
    // allocator beside DoReMi (q424, learned) and UniMax (q439,
    // epoch-capped): one pinned pow per domain, integer-exact
    // normalization and up-sampling boost (r15).
    "q460_temperature_mixture" -> ((s, dir) =>
      operators.Mixture.temperatureWeightsE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("v")),
        col("source"), alphaE6 = 500000L)
        .withColumnRenamed("domain", "source")),

    // Dataset-cartography map (Swayamdipta et al. 2020), count-based
    // core: users as examples, weeks as epochs, weekly conversion as
    // the binary hit — exact (confidence, variability) per example
    // (n²σ² = s(n−s), corrected isqrt) bucketed into the easy/hard/
    // ambiguous curation regions. Output is the region-census map.
    "q447_cartography" -> ((s, dir) =>
      operators.TrainingDynamics.cartographyE6(ev(s, dir),
        col("user_id"), expr("ts_ms div 604800000"),
        col("event_type") === "purchase")),

    // Forgetting-event census (Toneva et al. 2019): per example the
    // learned→forgotten transition count across ordered weekly epochs
    // (one lead() in real per-user partitions on the zero-filled
    // grid); ever_learned ∧ n_forget = 0 is the unforgettable
    // (safely-prunable) class.
    "q448_forgetting" -> ((s, dir) =>
      operators.TrainingDynamics.forgettingCensus(ev(s, dir),
        col("user_id"), expr("ts_ms div 604800000"),
        col("event_type") === "purchase")),

    // Experiment power planner per segment: exact sample variance,
    // required per-arm n for a 1%-of-mean lift (ceil division), and
    // the minimum detectable effect at the CURRENT n (corrected
    // isqrt) — pinned e3 z-scores (α 5% two-sided, 80% power).
    "q376_power_mde" -> ((s, dir) =>
      operators.PowerAnalysis.mdeSampleSize(t(s, dir, "lineitem"),
        Seq("l_returnflag"), cents(col("l_extendedprice")))),

    // Weight-of-evidence + information value over order priority vs
    // final status — the scorecard categorical encoding and the feature-
    // screening statistic (Siddiqi 2006). Adjusted-WoE +0.5 smoothing,
    // e6-rounded pinned double pipeline; one cardinality-bounded hash
    // aggregate + broadcast totals, nothing row-scaled shuffles twice.
    "q329_woe_iv" -> ((s, dir) =>
      operators.TargetEncode.woeIv(t(s, dir, "orders"),
        "o_orderpriority", col("o_orderstatus") === "F")),

    // Two-way fixed effects (the panel workhorse generalizing q238's
    // 2×2 diff-in-diff): on the BALANCED type×day revenue grid
    // (0-filled), the within transform ỹ·UT = y·UT − S_u·U − S_t·T + S
    // is pure integers because balance makes every mean's denominator
    // uniform; β̂ = Σ ỹD̃ / Σ D̃² emitted as the exact (num, den) pair +
    // e6 ratio. Treatment = {purchase, click} after the midpoint day.
    "q321_twfe" -> ((s, dir) => {
      val e = ev(s, dir).where(col("value").isNotNull)
        .groupBy(col("event_type"), expr("ts_ms div 86400000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val types = e.select(col("event_type")).distinct()
      val days = e.select(col("day")).distinct()
      val mid = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val grid = types.crossJoin(days)
        .join(e, Seq("event_type", "day"), "left")
        .na.fill(0L, Seq("cents"))
        .crossJoin(broadcast(mid))
        .withColumn("d",
          (col("event_type").isin("purchase", "click") &&
            col("day") >= col("mid")).cast("long"))
      val dims = grid.agg(countDistinct(col("event_type")).as("uu"),
        countDistinct(col("day")).as("tt"),
        sum(col("cents")).as("sy"), sum(col("d")).as("sd"))
      val su = grid.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("su_y"), sum(col("d")).as("su_d"))
      val st = grid.groupBy(col("day"))
        .agg(sum(col("cents")).as("st_y"), sum(col("d")).as("st_d"))
      grid.join(broadcast(su), "event_type").join(broadcast(st), "day")
        .crossJoin(broadcast(dims))
        .withColumn("yt", expr(
          "cents * uu * tt - su_y * uu - st_y * tt + sy"))
        .withColumn("dt", expr(
          "d * uu * tt - su_d * uu - st_d * tt + sd"))
        .agg(sum(expr("CAST(yt AS DECIMAL(38,0)) * dt")).as("numd"),
          sum(expr("CAST(dt AS DECIMAL(38,0)) * dt")).as("dend"))
        .select(col("numd").cast("decimal(38,0)").cast("string").as("num"),
          col("dend").cast("decimal(38,0)").cast("string").as("den"),
          expr("CAST(numd * 1000000 div dend AS BIGINT)").as("beta_e6"))
    }),

    // "Why did the metric move": Oaxaca-style decomposition of the
    // period-over-period change in revenue-per-event into per-segment
    // MIX (share shift at old rate), RATE (rate shift at old share) and
    // INTERACTION terms — Δavg = Σ (w₂−w₁)r₁ + w₁(r₂−r₁) + Δw·Δr. All
    // terms e6-truncated integers; truncation breaks exact additivity,
    // so the per-segment RESIDUAL vs the true Δ contribution is emitted
    // rather than hidden (the honest version of every BI contribution
    // report). Periods split at the midpoint day via a one-row
    // broadcast, no driver fetch.
    "q314_mix_shift" -> ((s, dir) => {
      val e = ev(s, dir).where(col("value").isNotNull)
        .select(col("event_type"), expr("ts_ms div 86400000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
      val split = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val seg = e.crossJoin(broadcast(split))
        .withColumn("p", when(col("day") < col("mid"), 1).otherwise(2))
        .groupBy(col("event_type"), col("p"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      val tot = seg.groupBy(col("p")).agg(sum(col("n")).as("np"))
      val wide = seg.join(tot, "p")
        .withColumn("w_e6", expr("n * 1000000L div np"))
        .withColumn("r_e6", expr("c * 1000000L div n"))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("p") === 1, col("w_e6"))).as("w1"),
          max(when(col("p") === 1, col("r_e6"))).as("r1"),
          max(when(col("p") === 2, col("w_e6"))).as("w2"),
          max(when(col("p") === 2, col("r_e6"))).as("r2"))
        .na.fill(0L, Seq("w1", "r1", "w2", "r2"))
      wide.select(col("event_type"),
          expr("(w2 - w1) * r1 div 1000000L").as("mix_e6"),
          expr("w1 * (r2 - r1) div 1000000L").as("rate_e6"),
          expr("(w2 - w1) * (r2 - r1) div 1000000L").as("inter_e6"),
          expr("""w2 * r2 div 1000000L - w1 * r1 div 1000000L
            - (w2 - w1) * r1 div 1000000L
            - w1 * (r2 - r1) div 1000000L
            - (w2 - w1) * (r2 - r1) div 1000000L""").as("residual_e6"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // pass-through doubles (bucket max, then carried) — no cross-engine
    // float arithmetic, so the fill is exactly comparable
    "q68_stratified_split" -> q68OracleSql,

    "q73_weighted_sample" -> q73OracleSql,

    "q101_dsir_weights" -> q101OracleSql,

    // q147: the q111 pair set, position rank by (touch_ts, touch_id),
    // U-shaped shares with the remainder on the last touch.
    "q147_position_attribution" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_ms(ts) AS ts,
        |  event_type AS et FROM events
        | WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT u, id AS conv_id, ts AS conv_ts FROM e
        | WHERE et = 'purchase'),
        |t AS (SELECT u, id AS touch_id, ts AS touch_ts FROM e
        | WHERE et = 'click'),
        |p AS (SELECT c.u, c.conv_id, c.conv_ts, t.touch_id, t.touch_ts
        | FROM c JOIN t ON c.u = t.u
        |  AND t.touch_ts >= c.conv_ts - 604800000
        |  AND t.touch_ts <= c.conv_ts - 1),
        |r AS (SELECT u, conv_id, conv_ts, touch_id, touch_ts,
        |  count(*) OVER (PARTITION BY conv_id) AS n,
        |  row_number() OVER (PARTITION BY conv_id
        |    ORDER BY touch_ts, touch_id) AS rk
        | FROM p)
        |SELECT u AS user_id, conv_id, conv_ts, touch_id, touch_ts,
        |  CAST(rk AS INTEGER) AS pos, CAST(n AS BIGINT) AS n_touches,
        |  CAST(CASE WHEN n = 1 THEN 1000000 WHEN n = 2 THEN 500000
        |    WHEN rk = 1 THEN 400000
        |    WHEN rk = n THEN 400000 + 200000 % (n - 2)
        |    ELSE 200000 // (n - 2) END AS BIGINT) AS share_ppm
        |FROM r""".stripMargin,

    // q129: the q16 quality replay feeding the literal Wilson expression
    // tree — identical IEEE op order, sqrt correctly rounded both sides.
    "q129_wilson_gate" ->
      """WITH q AS (SELECT source,
        | greatest(least(
        |   CAST(floor(least(len(regexp_split_to_array(trim(text), '\s+')), 40) * 25 / 40) AS BIGINT)
        |   + CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |      THEN CAST(floor(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 50
        |                      / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      ELSE 0 END
        |   + (25 - CASE WHEN length(text) > 0
        |      THEN least(CAST(floor((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 100 / length(text)) AS BIGINT), 25)
        |      ELSE 0 END),
        |  100), 0) AS quality
        | FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (quality >= 75) AS BIGINT) AS n_pass
        | FROM q GROUP BY 1)
        |SELECT source, n, n_pass,
        | CAST(round((CAST(n_pass AS DOUBLE)/CAST(n AS DOUBLE)
        |    + (1.96*1.96)/(2.0*CAST(n AS DOUBLE))
        |    - 1.96*sqrt(CAST(n_pass AS DOUBLE)/CAST(n AS DOUBLE)
        |        *(1.0 - CAST(n_pass AS DOUBLE)/CAST(n AS DOUBLE))
        |        /CAST(n AS DOUBLE)
        |      + (1.96*1.96)/(4.0*CAST(n AS DOUBLE)*CAST(n AS DOUBLE))))
        |   /(1.0 + (1.96*1.96)/CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
        |  AS wilson_lb_e6
        |FROM g""".stripMargin,

    // q122: the q100 LM replay feeding q113's rank-cut binning — quartile
    // cuts at ceil(n·b/4) over (score, doc_id), collapse-left boundaries.
    "q122_curriculum" ->
      """WITH tb AS (SELECT doc_id, lang,
        |  list_prepend('<s>', regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        | FROM documents),
        |pr AS (SELECT doc_id, lang, toks, unnest(range(2, len(toks) + 1)) AS i FROM tb),
        |p AS (SELECT doc_id, lang, toks[i-1] AS prev, toks[i] AS cur FROM pr),
        |cb AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb FROM p
        | WHERE lang = 'en' GROUP BY 1, 2),
        |cu AS (SELECT prev, CAST(count(*) AS BIGINT) AS cu FROM p
        | WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT cur) + 1 AS BIGINT) AS v FROM p
        | WHERE lang = 'en'),
        |c AS (SELECT doc_id,
        |  CAST(round(ln(CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE)
        |    / CAST(coalesce(cu.cu, 0) + v.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
        | FROM p LEFT JOIN cb USING (prev, cur) LEFT JOIN cu USING (prev) CROSS JOIN v),
        |sc AS (SELECT doc_id, CAST((-sum(lp)) // count(*) AS BIGINT) AS s
        | FROM c GROUP BY 1),
        |n2 AS (SELECT count(*) AS c2 FROM sc),
        |r2 AS (SELECT s, doc_id, row_number() OVER (ORDER BY s, doc_id) AS rn FROM sc),
        |cuts AS (SELECT r2.s AS cut FROM r2, n2
        | WHERE r2.rn IN (SELECT (n2.c2*b*25 + 99)//100
        |   FROM (SELECT unnest(range(1, 4)) AS b) bb(b), n2)),
        |b2 AS (SELECT sc.s,
        |  1 + (SELECT count(*) FROM cuts WHERE cut < sc.s) AS bucket FROM sc)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(s) AS min_nll, max(s) AS max_nll
        |FROM b2 GROUP BY bucket""".stripMargin,

    // Same window shape: strictly-earlier range frame for the candidate
    // touch time, min-id tie-break on the touch join, integer lookback.
    "q111_linear_attribution" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_ms(ts) AS ts,
        |  event_type AS et FROM events
        | WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT u, id AS conv_id, ts AS conv_ts FROM e
        | WHERE et = 'purchase'),
        |t AS (SELECT u, id AS touch_id, ts AS touch_ts FROM e
        | WHERE et = 'click'),
        |p AS (SELECT c.u, c.conv_id, c.conv_ts, t.touch_id, t.touch_ts
        | FROM c JOIN t ON c.u = t.u
        |  AND t.touch_ts >= c.conv_ts - 604800000
        |  AND t.touch_ts <= c.conv_ts - 1),
        |r AS (SELECT u, conv_id, conv_ts, touch_id, touch_ts,
        |  count(*) OVER (PARTITION BY conv_id) AS n,
        |  row_number() OVER (PARTITION BY conv_id
        |    ORDER BY touch_ts DESC, touch_id) AS rk
        | FROM p)
        |SELECT u AS user_id, conv_id, conv_ts, touch_id, touch_ts,
        |  CAST(1000000 // n + (CASE WHEN rk = 1 THEN 1000000 % n ELSE 0 END)
        |    AS BIGINT) AS share_ppm
        |FROM r""".stripMargin,

    "q110_attribution" ->
      """WITH e AS (SELECT user_id AS u, event_id AS id, epoch_ms(ts) AS ts,
        |  event_type AS et FROM events
        | WHERE event_type IN ('click', 'purchase')),
        |c AS (SELECT u, id AS conv_id, ts AS conv_ts, last_touch_ts FROM (
        |  SELECT u, id, ts, et,
        |   max(CASE WHEN et = 'click' THEN ts END) OVER (PARTITION BY u
        |     ORDER BY ts RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS last_touch_ts
        |  FROM e) WHERE et = 'purchase'),
        |t AS (SELECT u, ts AS touch_ts, min(id) AS touch_id FROM e
        | WHERE et = 'click' GROUP BY 1, 2),
        |j AS (SELECT c.u, c.conv_id, c.conv_ts, t.touch_id, t.touch_ts,
        |  (t.touch_ts IS NOT NULL
        |   AND c.conv_ts - t.touch_ts <= 604800000) AS in_window
        | FROM c LEFT JOIN t ON c.u = t.u AND c.last_touch_ts = t.touch_ts)
        |SELECT u AS user_id, conv_id, conv_ts,
        |  CASE WHEN in_window THEN touch_id ELSE -1 END AS touch_id,
        |  CASE WHEN in_window THEN touch_ts ELSE -1 END AS touch_ts,
        |  CASE WHEN in_window THEN conv_ts - touch_ts ELSE -1 END AS lag_ms,
        |  in_window AS attributed
        |FROM j""".stripMargin,

    // Same pinned pipeline: one pow per source → micro round → integer
    // normalization (both engines' libm pow on identical integer inputs).
    "q104_mixture_weights" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        | FROM documents GROUP BY 1),
        |u AS (SELECT source, n_docs,
        |  CAST(round(pow(CAST(n_docs AS DOUBLE), 0.7) * 1000000.0) AS BIGINT)
        |    AS u_micro FROM c),
        |g AS (SELECT CAST(sum(u_micro) AS BIGINT) AS u_total FROM u)
        |SELECT source, n_docs,
        |  CAST((u_micro * 1000000) // u_total AS BIGINT) AS share_ppm,
        |  CAST(((u_micro * 1000000) // u_total) * 100000 // 1000000 AS BIGINT)
        |    AS quota
        |FROM u CROSS JOIN g""".stripMargin,

    // q234: full coalition replay — per-user exposure masks, v(S) as the
    // e6 rate of EXACT-set users, integer weights s!(n−1−s)! summing to
    // n! per channel.
    "q234_shapley" ->
      """WITH ein AS (
        | SELECT user_id, event_type FROM events
        | WHERE ((epoch_ms(ts) // 86400000) % 7 = user_id % 7
        |    AND event_type IN ('view', 'click', 'signup', 'error'))
        |  OR event_type = 'purchase'),
        |u AS (
        | SELECT user_id,
        |  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |  + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |  + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |  + 8 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |   AS mask,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM ein GROUP BY 1),
        |pm AS (
        | SELECT mask, CAST(sum(conv) AS BIGINT) * 1000000 // count(*) AS v
        | FROM u GROUP BY 1),
        |co AS (
        | SELECT i, s, s | (1 << i) AS si,
        |  CASE bit_count(CAST(s AS BIGINT)) WHEN 0 THEN 6 WHEN 1 THEN 2
        |   WHEN 2 THEN 2 ELSE 6 END AS w
        | FROM range(0, 4) t(i), range(0, 16) r(s)
        | WHERE (s & (1 << i)) = 0),
        |j AS (
        | SELECT i, (coalesce(b.v, 0) - coalesce(a.v, 0)) * w AS lift
        | FROM co LEFT JOIN pm a ON a.mask = co.s
        |  LEFT JOIN pm b ON b.mask = co.si)
        |SELECT CASE i WHEN 0 THEN 'view' WHEN 1 THEN 'click'
        |  WHEN 2 THEN 'signup' ELSE 'error' END AS channel,
        | CAST(sum(lift) AS BIGINT) AS phi_x24_e6
        |FROM j GROUP BY 1""".stripMargin,

    // q235: stats → corrected isqrt → Hamilton replay.
    "q235_neyman" ->
      """WITH st AS (
        | SELECT event_type, count(*) AS n_h,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)
        |    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS syy
        | FROM events GROUP BY 1),
        |v AS (
        | SELECT event_type, n_h, n_h * syy - sy * sy AS var_num,
        |  CAST(floor(sqrt(CAST(n_h * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS s0
        | FROM st),
        |wt AS (
        | SELECT event_type, n_h,
        |  CASE WHEN s0 * s0 > var_num THEN s0 - 1
        |   WHEN (s0 + 1) * (s0 + 1) <= var_num THEN s0 + 1
        |   ELSE s0 END AS w
        | FROM v),
        |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tot FROM wt),
        |a AS (
        | SELECT event_type, n_h, w AS weight,
        |  (CAST(10000 AS HUGEINT) * w) // tot AS base,
        |  (CAST(10000 AS HUGEINT) * w) % tot AS rem
        | FROM wt, t),
        |d AS (
        | SELECT *, 10000 - sum(base) OVER () AS deficit,
        |  row_number() OVER (ORDER BY rem DESC, event_type) AS rk
        | FROM a)
        |SELECT event_type, n_h, weight,
        | CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |  AS quota
        |FROM d""".stripMargin,

    // q238: same pinned order — four e6 cell means, then differences.
    // Integer midpoint (min+max) div 2 — never a double cast, whose
    // rounding differs between engines.
    "q239_markov_removal" -> q239OracleSql,

    // q240: same ntile over the same total order; cumulative counts
    // then e6 rates.
    "q240_uplift_curve" ->
      """WITH u AS (
        | SELECT user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS score,
        |  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS tr,
        |  CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) >= 59000
        |   THEN 1 ELSE 0 END AS cv
        | FROM events GROUP BY 1),
        |td AS (
        | SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS tile
        | FROM u),
        |pt AS (
        | SELECT tile, count(*) AS n,
        |  CAST(sum(tr) AS BIGINT) AS n_t,
        |  CAST(sum(tr * cv) AS BIGINT) AS conv_t,
        |  CAST(sum(1 - tr) AS BIGINT) AS n_c,
        |  CAST(sum((1 - tr) * cv) AS BIGINT) AS conv_c
        | FROM td GROUP BY 1),
        |cm AS (
        | SELECT *, sum(n_t) OVER w AS cum_n_t,
        |  sum(conv_t) OVER w AS cum_conv_t,
        |  sum(n_c) OVER w AS cum_n_c, sum(conv_c) OVER w AS cum_conv_c
        | FROM pt WINDOW w AS (ORDER BY tile
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(tile AS INTEGER) AS tile, n, n_t, conv_t, n_c, conv_c,
        | CAST(cum_n_t AS BIGINT) AS cum_n_t,
        | CAST(cum_conv_t AS BIGINT) AS cum_conv_t,
        | CAST(cum_n_c AS BIGINT) AS cum_n_c,
        | CAST(cum_conv_c AS BIGINT) AS cum_conv_c,
        | CAST(CASE WHEN cum_n_t > 0
        |  THEN cum_conv_t * 1000000 // cum_n_t END AS BIGINT) AS rate_t_e6,
        | CAST(CASE WHEN cum_n_c > 0
        |  THEN cum_conv_c * 1000000 // cum_n_c END AS BIGINT) AS rate_c_e6,
        | CAST((CASE WHEN cum_n_t > 0
        |   THEN cum_conv_t * 1000000 // cum_n_t END)
        | - (CASE WHEN cum_n_c > 0
        |   THEN cum_conv_c * 1000000 // cum_n_c END) AS BIGINT) AS uplift_e6
        |FROM cm""".stripMargin,

    "q238_diff_in_diff" ->
      """WITH e AS (
        | SELECT user_id % 2 = 0 AS treated,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
        |  CAST(round(value * 100) AS BIGINT) AS y
        | FROM events),
        |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM e),
        |c AS (
        | SELECT
        |  CAST(sum(CASE WHEN treated AND ts_ms < mid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_t_pre,
        |  CAST(sum(CASE WHEN treated AND ts_ms < mid THEN y ELSE 0 END)
        |    AS BIGINT) AS sum_t_pre,
        |  CAST(sum(CASE WHEN treated AND ts_ms >= mid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_t_post,
        |  CAST(sum(CASE WHEN treated AND ts_ms >= mid THEN y ELSE 0 END)
        |    AS BIGINT) AS sum_t_post,
        |  CAST(sum(CASE WHEN NOT treated AND ts_ms < mid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_c_pre,
        |  CAST(sum(CASE WHEN NOT treated AND ts_ms < mid THEN y ELSE 0 END)
        |    AS BIGINT) AS sum_c_pre,
        |  CAST(sum(CASE WHEN NOT treated AND ts_ms >= mid THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_c_post,
        |  CAST(sum(CASE WHEN NOT treated AND ts_ms >= mid THEN y ELSE 0 END)
        |    AS BIGINT) AS sum_c_post
        | FROM e, m)
        |SELECT *,
        | (m_t_post_e6 - m_t_pre_e6) - (m_c_post_e6 - m_c_pre_e6) AS did_e6
        |FROM (
        | SELECT *,
        |  CASE WHEN n_t_pre > 0 THEN sum_t_pre * 1000000 // n_t_pre END
        |    AS m_t_pre_e6,
        |  CASE WHEN n_t_post > 0 THEN sum_t_post * 1000000 // n_t_post END
        |    AS m_t_post_e6,
        |  CASE WHEN n_c_pre > 0 THEN sum_c_pre * 1000000 // n_c_pre END
        |    AS m_c_pre_e6,
        |  CASE WHEN n_c_post > 0 THEN sum_c_post * 1000000 // n_c_post END
        |    AS m_c_post_e6
        | FROM c)""".stripMargin,

    // q259: unit-grain conditional sums, pooled quadratics, the same
    // common-denominator algebra in HUGEINT.
    "q259_cuped" ->
      """WITH b AS (SELECT epoch_ms(ts) AS ts_ms, user_id,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |u AS (SELECT user_id,
        |  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS t,
        |  sum(CASE WHEN ts_ms < mid THEN v ELSE 0 END) AS x,
        |  sum(CASE WHEN ts_ms >= mid THEN v ELSE 0 END) AS y
        | FROM b, m GROUP BY 1),
        |a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n_t,
        |  sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS sx_t,
        |  sum(CASE WHEN t <> 1 THEN x ELSE 0 END) AS sx_c,
        |  sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t,
        |  sum(CASE WHEN t <> 1 THEN y ELSE 0 END) AS sy_c,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT)*x) AS sxx, sum(CAST(x AS HUGEINT)*y) AS sxy
        | FROM u),
        |c AS (SELECT n_t, n - n_t AS n_c,
        |  CAST(sy_t AS HUGEINT)*(n - n_t) - CAST(sy_c AS HUGEINT)*n_t
        |    AS raw_num,
        |  CAST(n_t AS HUGEINT)*(n - n_t) AS raw_den,
        |  CAST(sx_t AS HUGEINT)*(n - n_t) - CAST(sx_c AS HUGEINT)*n_t
        |    AS xdiff_num,
        |  n*sxy - sx*sy AS theta_num, n*sxx - sx*sx AS theta_den
        | FROM a)
        |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
        |  CAST(CAST(raw_num AS DECIMAL(38,0)) AS VARCHAR) AS raw_num,
        |  CAST(CAST(raw_den AS DECIMAL(38,0)) AS VARCHAR) AS raw_den,
        |  CAST(CAST(theta_num AS DECIMAL(38,0)) AS VARCHAR) AS theta_num,
        |  CAST(CAST(theta_den AS DECIMAL(38,0)) AS VARCHAR) AS theta_den,
        |  CAST(CAST(raw_num*theta_den - theta_num*xdiff_num
        |    AS DECIMAL(38,0)) AS VARCHAR) AS cuped_num,
        |  CAST(CAST(raw_den*theta_den AS DECIMAL(38,0)) AS VARCHAR)
        |    AS cuped_den
        |FROM c""".stripMargin,

    // q262: same unit grain as q259; strata via format('{:b}') bit
    // length, HUGEINT cross-multiplication, // truncation parity.
    "q262_poststrat_ate" ->
      """WITH b AS (SELECT user_id, epoch_ms(ts) AS ts_ms,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |u AS (SELECT user_id,
        |  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS t,
        |  CAST(sum(CASE WHEN ts_ms < mid THEN v ELSE 0 END) AS BIGINT) AS x,
        |  sum(CASE WHEN ts_ms >= mid THEN v ELSE 0 END) AS y
        | FROM b, m GROUP BY 1),
        |s AS (SELECT CAST(length(format('{:b}', x)) AS BIGINT) AS stratum,
        |  count(*) AS n_units,
        |  CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |  CAST(sum(CASE WHEN t <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |  sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t,
        |  sum(CASE WHEN t <> 1 THEN y ELSE 0 END) AS sy_c
        | FROM u GROUP BY 1),
        |d AS (SELECT stratum, n_units, n_t, n_c,
        |  CASE WHEN n_t > 0 AND n_c > 0 THEN
        |   CAST((CAST(sy_t AS HUGEINT)*n_c - CAST(sy_c AS HUGEINT)*n_t)
        |     * 1000000 // (CAST(n_t AS HUGEINT)*n_c) AS BIGINT)
        |  END AS diff_e6 FROM s)
        |SELECT stratum, n_units, n_t, n_c, diff_e6 FROM d
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(sum(n_units) AS BIGINT),
        |  CAST(sum(n_t) AS BIGINT), CAST(sum(n_c) AS BIGINT),
        |  CAST(sum(CAST(n_units AS HUGEINT) * diff_e6)
        |    // sum(CAST(n_units AS HUGEINT)) AS BIGINT)
        |FROM d WHERE diff_e6 IS NOT NULL""".stripMargin,

    // q265: argmax by the same truncated mean_e6, ties to first arm;
    // uniform-5 IPS as exact integer ratio.
    // q359: the same policy CTEs, then per-row SNIPS/DR contributions
    // with truncating e-scale divisions replayed literally.
    "q359_snips_dr" ->
      """WITH b AS (SELECT user_id % 4 AS segment, event_type AS arm,
        |  CAST(round(value*100) AS BIGINT) AS r,
        |  100000 + (event_id % 5) * 150000 AS p,
        |  epoch_ms(ts) AS ts_ms FROM events),
        |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |q AS (SELECT segment, arm,
        |  (sum(r) * 1000000) // count(*) AS q_e6
        | FROM b, m WHERE ts_ms < mid GROUP BY 1, 2),
        |pol AS (SELECT segment, arm AS chosen_arm, q_e6 AS q_pi FROM (
        |  SELECT segment, arm, q_e6, row_number() OVER (
        |    PARTITION BY segment ORDER BY q_e6 DESC, arm) AS rk FROM q) z
        | WHERE rk = 1),
        |evl AS (SELECT b.segment, pol.chosen_arm,
        |  b.arm = pol.chosen_arm AS m2,
        |  q2.q_e6 IS NULL AS miss,
        |  CASE WHEN b.arm = pol.chosen_arm
        |   THEN b.r * 1000000000000 // b.p ELSE 0 END AS sn,
        |  CASE WHEN b.arm = pol.chosen_arm
        |   THEN 1000000000000 // b.p ELSE 0 END AS sd,
        |  pol.q_pi + CASE WHEN b.arm = pol.chosen_arm
        |   THEN (b.r * 1000000 - coalesce(q2.q_e6, 0)) * 1000000 // b.p
        |   ELSE 0 END AS dr
        | FROM b CROSS JOIN m
        | JOIN pol ON pol.segment = b.segment
        | LEFT JOIN q q2 ON q2.segment = b.segment AND q2.arm = b.arm
        | WHERE b.ts_ms >= mid)
        |SELECT segment, chosen_arm, count(*) AS n_eval,
        | CAST(sum(CASE WHEN m2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_matched,
        | CAST(sum(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_train_miss,
        | CAST(CAST(sum(sn) AS DECIMAL(38,0)) AS VARCHAR) AS snips_num,
        | CAST(CAST(sum(sd) AS DECIMAL(38,0)) AS VARCHAR) AS snips_den,
        | CAST(CASE WHEN sum(sd) = 0 THEN NULL
        |  ELSE CAST(sum(sn) AS HUGEINT) * 1000000 // sum(sd) END
        |  AS BIGINT) AS snips_e6,
        | CAST(CAST(sum(dr) AS DECIMAL(38,0)) AS VARCHAR) AS dr_sum_e6,
        | CAST(CAST(sum(dr) AS HUGEINT) // count(*) AS BIGINT)
        |   AS dr_mean_e6
        |FROM evl GROUP BY 1, 2""".stripMargin,

    "q265_replay_ips" ->
      """WITH b AS (SELECT user_id % 4 AS segment, event_type AS arm,
        |  CAST(round(value*100) AS BIGINT) AS r,
        |  epoch_ms(ts) AS ts_ms FROM events),
        |m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM b),
        |tr AS (SELECT segment, arm, sum(r) AS s, count(*) AS n
        | FROM b, m WHERE ts_ms < mid GROUP BY 1, 2),
        |p AS (SELECT segment, arm AS chosen_arm FROM (
        |  SELECT segment, arm, row_number() OVER (PARTITION BY segment
        |    ORDER BY (s * 1000000) // n DESC, arm) AS rk FROM tr)
        | WHERE rk = 1)
        |SELECT b.segment, chosen_arm, count(*) AS n_eval,
        |  CAST(sum(CASE WHEN arm = chosen_arm THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN arm = chosen_arm THEN r ELSE 0 END)
        |    AS BIGINT) AS sum_matched,
        |  CAST(sum(CASE WHEN arm = chosen_arm THEN r ELSE 0 END) * 5
        |    AS BIGINT) AS ips_num,
        |  count(*) AS ips_den
        |FROM b, m, p
        |WHERE b.ts_ms >= mid AND p.segment = b.segment
        |GROUP BY 1, 2""".stripMargin,

    // q285: per-arm cumulative histogram quantiles (q89's oracle shape)
    // at ceil(n·p/100), pivoted and differenced.
    "q285_qte" ->
      """WITH b AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'treated'
        |   ELSE 'control' END AS arm,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events
        | WHERE value IS NOT NULL),
        |n AS (SELECT arm, count(*) AS n FROM b GROUP BY 1),
        |h AS (SELECT arm, v, count(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (SELECT arm, v, sum(c) OVER (PARTITION BY arm ORDER BY v)
        |  AS cum FROM h),
        |p AS (SELECT * FROM (VALUES (10), (25), (50), (75), (90))
        |  t(percent)),
        |q AS (SELECT cum.arm, CAST(p.percent AS BIGINT) AS percent,
        |  min(v) AS quantile
        | FROM cum JOIN n ON n.arm = cum.arm
        | JOIN p ON cum.cum >= (n.n * p.percent + 99) // 100
        | GROUP BY 1, 2)
        |SELECT t.percent, t.quantile AS q_treated,
        |  c.quantile AS q_control,
        |  t.quantile - c.quantile AS qte
        |FROM q t JOIN q c ON t.percent = c.percent
        |WHERE t.arm = 'treated' AND c.arm = 'control'""".stripMargin,

    // q286: same sufficient statistics in HUGEINT, same truncations,
    // same corrected isqrt (q235's pattern).
    "q286_balance_audit" ->
      """WITH b AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_type,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events
        | WHERE value IS NOT NULL),
        |m AS (SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid
        |  FROM events),
        |u AS (SELECT user_id,
        |  max(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS t,
        |  CAST(sum(v) AS BIGINT) AS x_spend,
        |  count(*) AS x_events,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS x_breadth
        | FROM b, m WHERE ts_ms < mid GROUP BY 1),
        |cells AS (
        | SELECT 'pre_spend' AS covariate, t, x_spend AS x FROM u
        | UNION ALL SELECT 'pre_events', t, x_events FROM u
        | UNION ALL SELECT 'pre_breadth', t, x_breadth FROM u),
        |a AS (SELECT covariate,
        |  CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |  CAST(sum(CASE WHEN t <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        |  CAST(sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS HUGEINT) AS st,
        |  CAST(sum(CASE WHEN t <> 1 THEN x ELSE 0 END) AS HUGEINT) AS sc,
        |  sum(CASE WHEN t = 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |    AS sst,
        |  sum(CASE WHEN t <> 1 THEN CAST(x AS HUGEINT) * x ELSE 0 END)
        |    AS ssc
        | FROM cells GROUP BY 1),
        |d AS (SELECT covariate, n_t, n_c,
        |  CAST((st * n_c - sc * n_t) * 1000000
        |    // (CAST(n_t AS HUGEINT) * n_c) AS BIGINT) AS mean_diff_e6,
        |  CAST((n_t * sst - st * st)
        |    // (CAST(n_t AS HUGEINT) * (n_t - 1)) AS BIGINT) AS vt,
        |  CAST((n_c * ssc - sc * sc)
        |    // (CAST(n_c AS HUGEINT) * (n_c - 1)) AS BIGINT) AS vc
        | FROM a),
        |e2 AS (SELECT *, (vt + vc) // 2 AS pool,
        |  CAST(floor(sqrt(CAST((vt + vc) // 2 AS DOUBLE))) AS BIGINT)
        |    AS s0
        | FROM d),
        |f AS (SELECT *, CASE WHEN s0 * s0 > pool THEN s0 - 1
        |  WHEN (s0 + 1) * (s0 + 1) <= pool THEN s0 + 1
        |  ELSE s0 END AS sd FROM e2)
        |SELECT covariate, n_t, n_c, mean_diff_e6, sd,
        |  CASE WHEN sd > 0 THEN mean_diff_e6 // (sd * 100) END AS smd_e4
        |FROM f""".stripMargin,

    // q298: per-row LOO/smoothed encodings replayed with HUGEINT
    // cross-multiplication, rolled to per-category checksums.
    "q298_target_encode" ->
      """WITH b AS (SELECT o_orderpriority,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS y FROM orders
        | WHERE o_totalprice IS NOT NULL),
        |cat AS (SELECT o_orderpriority, CAST(sum(y) AS HUGEINT) AS s,
        |  CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |g AS (SELECT CAST(sum(s) AS HUGEINT) AS gnum,
        |  CAST(sum(n) AS HUGEINT) AS gden FROM cat),
        |enc AS (
        | SELECT b.o_orderpriority,
        |  CASE WHEN c.n > 1 THEN CAST(
        |   (c.s - b.y) * 1000000 // (c.n - 1) AS BIGINT) END AS loo_e6,
        |  CAST(((c.s - b.y) * g.gden + 20 * g.gnum) * 1000000
        |   // ((c.n - 1 + 20) * g.gden) AS BIGINT) AS smooth_e6
        | FROM b JOIN cat c USING (o_orderpriority) CROSS JOIN g)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(loo_e6 % 1000003) AS BIGINT) AS loo_check,
        |  CAST(min(loo_e6) AS BIGINT) AS loo_min,
        |  CAST(max(loo_e6) AS BIGINT) AS loo_max,
        |  CAST(sum(smooth_e6 % 1000003) AS BIGINT) AS smooth_check
        |FROM enc GROUP BY 1""".stripMargin,

    // q381: all six IPF scaling steps unrolled in HUGEINT; margin sums
    // as windows over the cell census (same integers as the join form).
    "q381_raking" -> {
      def rowStep(src: String, out: String) =
        s"""$out AS (SELECT rk, ck, n,
           | CASE WHEN sum(w) OVER (PARTITION BY rk) > 0
           |  THEN w * coalesce(tg, 0) * 1000000
           |   // sum(w) OVER (PARTITION BY rk)
           |  ELSE CAST(0 AS HUGEINT) END AS w
           | FROM $src LEFT JOIN rt USING (rk))""".stripMargin
      def colStep(src: String, out: String) =
        s"""$out AS (SELECT rk, ck, n,
           | CASE WHEN sum(w) OVER (PARTITION BY ck) > 0
           |  THEN w * coalesce(tg, 0) * 1000000
           |   // sum(w) OVER (PARTITION BY ck)
           |  ELSE CAST(0 AS HUGEINT) END AS w
           | FROM $src LEFT JOIN ct USING (ck))""".stripMargin
      s"""WITH samp AS (SELECT CAST(c_nationkey AS BIGINT) AS rk,
         |  c_mktsegment AS ck FROM customer WHERE c_acctbal > 0),
         |c0 AS (SELECT rk, ck, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) AS HUGEINT) * 1000000 AS w
         | FROM samp GROUP BY 1, 2),
         |rt AS (SELECT CAST(c_nationkey AS BIGINT) AS rk,
         |  CAST(count(*) AS HUGEINT) AS tg FROM customer GROUP BY 1),
         |ct AS (SELECT c_mktsegment AS ck,
         |  CAST(count(*) AS HUGEINT) AS tg FROM customer GROUP BY 1),
         |${rowStep("c0", "r1")},
         |${colStep("r1", "d1")},
         |${rowStep("d1", "r2")},
         |${colStep("r2", "d2")},
         |${rowStep("d2", "r3")},
         |${colStep("r3", "d3")}
         |SELECT rk AS nation, ck AS segment, n,
         | CAST(w AS BIGINT) AS w_e6
         |FROM d3""".stripMargin
    },

    // q399: the pinned ln-e3 pipeline, quadratic forms in HUGEINT,
    // toward-zero elasticity quotient.
    "q399_price_elasticity" ->
      """WITH j AS (SELECT p_brand,
        |  CAST(round(ln(CAST(CAST(round(p_retailprice * 100) AS BIGINT)
        |   AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
        |  CAST(round(ln(CAST(CAST(round(l_quantity) AS BIGINT)
        |   AS DOUBLE)) * 1000.0) AS BIGINT) AS y
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx
        | FROM j GROUP BY 1),
        |f AS (SELECT p_brand, n, sum_x, sum_y,
        |  n * sxy - CAST(sum_x AS HUGEINT) * sum_y AS slope_num,
        |  n * sxx - CAST(sum_x AS HUGEINT) * sum_x AS slope_den
        | FROM g)
        |SELECT p_brand, n, sum_x, sum_y,
        | CAST(CAST(slope_num AS DECIMAL(38,0)) AS VARCHAR) AS slope_num,
        | CAST(CAST(slope_den AS DECIMAL(38,0)) AS VARCHAR) AS slope_den,
        | CASE WHEN slope_den > 0 THEN
        |  CAST(slope_num * 1000000 // slope_den AS BIGINT)
        | END AS elasticity_e6
        |FROM f""".stripMargin,

    // q424: q374-pinned per-cell KL micro-nats; the 3 MW rounds unroll
    // as plain HUGEINT CTEs (the linearized update is rational — no exp).
    "q424_doremi_mixture" ->
      """WITH tok AS (SELECT source AS d,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS v
        | FROM documents),
        |cells AS (SELECT d, v, count(*) AS c FROM tok GROUP BY 1, 2),
        |corpus AS (SELECT v, CAST(sum(c) AS BIGINT) AS cc FROM cells
        | GROUP BY 1),
        |ng AS (SELECT d, CAST(sum(c) AS BIGINT) AS ng,
        |  CAST(count(*) AS BIGINT) AS n_values FROM cells GROUP BY 1),
        |nt AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM corpus),
        |ex AS (SELECT cells.d,
        |  CAST(greatest(CAST(0 AS HUGEINT),
        |    sum(CAST(round((CAST(c AS DOUBLE) / ng.ng)
        |      * ln((CAST(c AS DOUBLE) / ng.ng) / (CAST(cc AS DOUBLE) / n))
        |      * 1000000.0) AS HUGEINT))) AS BIGINT) AS excess_e6
        | FROM cells JOIN corpus USING (v) JOIN ng USING (d), nt
        | GROUP BY cells.d),
        |dom AS (SELECT ng.d, ng.ng, ng.n_values,
        |  CAST(CAST(ng.ng AS HUGEINT) * 1000000 // n AS BIGINT)
        |   AS share_e6, ex.excess_e6
        | FROM ng JOIN ex ON ex.d = ng.d, nt),
        |dc AS (SELECT CAST(count(*) AS BIGINT) AS dn FROM dom),
        |r0 AS (SELECT d, CAST(1000000 // dn AS HUGEINT) AS w
        | FROM dom, dc),
        |b1 AS (SELECT r0.d, r0.w * (1000000
        |   + ((500000 * CAST(dom.excess_e6 AS HUGEINT)) // 1000000))
        |  // 1000000 AS wp FROM r0 JOIN dom USING (d)),
        |t1 AS (SELECT sum(wp) AS tw FROM b1),
        |r1 AS (SELECT d, wp * 1000000 // tw AS w FROM b1, t1),
        |b2 AS (SELECT r1.d, r1.w * (1000000
        |   + ((500000 * CAST(dom.excess_e6 AS HUGEINT)) // 1000000))
        |  // 1000000 AS wp FROM r1 JOIN dom USING (d)),
        |t2 AS (SELECT sum(wp) AS tw FROM b2),
        |r2 AS (SELECT d, wp * 1000000 // tw AS w FROM b2, t2),
        |b3 AS (SELECT r2.d, r2.w * (1000000
        |   + ((500000 * CAST(dom.excess_e6 AS HUGEINT)) // 1000000))
        |  // 1000000 AS wp FROM r2 JOIN dom USING (d)),
        |t3 AS (SELECT sum(wp) AS tw FROM b3),
        |r3 AS (SELECT d, wp * 1000000 // tw AS w FROM b3, t3)
        |SELECT dom.d AS source, dom.n_values, dom.ng AS n_tokens,
        | dom.share_e6, dom.excess_e6, CAST(r3.w AS BIGINT) AS w_e6
        |FROM dom JOIN r3 ON r3.d = dom.d""".stripMargin,

    // q439: the waterfill replayed with HUGEINT window arithmetic —
    // same capped-prefix predicate, same R // m + remainder rule.
    "q439_unimax_mixture" ->
      """WITH tok AS (SELECT source AS d,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS v
        | FROM documents),
        |census AS (SELECT d, CAST(count(*) AS BIGINT) AS nd
        | FROM tok GROUP BY 1),
        |capd AS (SELECT d, nd,
        |  CAST(nd AS HUGEINT) * 2500000 // 1000000 AS cap FROM census),
        |rk AS (SELECT d, nd, cap,
        |  CAST(row_number() OVER (ORDER BY cap, d) AS HUGEINT) AS i,
        |  sum(cap) OVER (ORDER BY cap, d ROWS UNBOUNDED PRECEDING) AS s_i,
        |  CAST(count(*) OVER () AS HUGEINT) AS n
        | FROM capd),
        |flag AS (SELECT *,
        |  (s_i + cap * (n - i) <= CAST(60000 AS HUGEINT)) AS capped
        | FROM rk),
        |kk AS (SELECT
        |  COALESCE(sum(CASE WHEN capped THEN CAST(1 AS HUGEINT) END),
        |    CAST(0 AS HUGEINT)) AS k,
        |  COALESCE(sum(CASE WHEN capped THEN cap END),
        |    CAST(0 AS HUGEINT)) AS s_k FROM flag),
        |alloc AS (SELECT f.d, f.nd, f.cap,
        |  CASE WHEN f.i <= kk.k THEN f.cap
        |   ELSE (CAST(60000 AS HUGEINT) - kk.s_k) // (f.n - kk.k)
        |    + (CASE WHEN f.i - kk.k
        |         <= (CAST(60000 AS HUGEINT) - kk.s_k) % (f.n - kk.k)
        |       THEN 1 ELSE 0 END)
        |  END AS a
        | FROM flag f, kk)
        |SELECT d AS source, nd AS n_tokens,
        | CAST(cap AS BIGINT) AS cap_tokens,
        | CAST(a AS BIGINT) AS alloc_tokens,
        | CAST(a * 1000000 // nd AS BIGINT) AS epochs_e6,
        | CAST(a * 1000000 // 60000 AS BIGINT) AS budget_share_e6
        |FROM alloc""".stripMargin,

    // q460: ONE pinned pow+round per domain (α literal written
    // 500000 / 1000000.0 in both engines), then pure HUGEINT
    // normalization — no double is ever summed.
    "q460_temperature_mixture" ->
      """WITH tok AS (SELECT source AS d,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS v
        | FROM documents),
        |census AS (SELECT d, CAST(count(*) AS BIGINT) AS nd
        | FROM tok GROUP BY 1),
        |q AS (SELECT d, nd,
        |  CAST(round(pow(CAST(nd AS DOUBLE), 500000 / 1000000.0)
        |    * 1000000.0) AS BIGINT) AS q_e6 FROM census),
        |t AS (SELECT CAST(sum(nd) AS HUGEINT) AS sn,
        |  CAST(sum(q_e6) AS HUGEINT) AS sq FROM q)
        |SELECT d AS source, nd AS n_tokens,
        | CAST(CAST(nd AS HUGEINT) * 1000000 // sn AS BIGINT) AS share_e6,
        | CAST(CAST(q_e6 AS HUGEINT) * 1000000 // sq AS BIGINT) AS samp_e6,
        | CASE WHEN CAST(nd AS HUGEINT) * 1000000 // sn > 0
        |  THEN CAST((CAST(q_e6 AS HUGEINT) * 1000000 // sq) * 1000000
        |   // (CAST(nd AS HUGEINT) * 1000000 // sn) AS BIGINT)
        |  ELSE 0 END AS boost_e6
        |FROM q, t""".stripMargin,

    // q447: zero-filled (user × week) grid, the exact s(n−s) variance
    // identity with the corrected-isqrt text mirrored verbatim.
    "q447_cartography" ->
      """WITH cells AS (SELECT user_id AS u,
        |  epoch_ms(ts) // 604800000 AS ep,
        |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |eps AS (SELECT DISTINCT ep FROM cells),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n FROM eps),
        |grid AS (SELECT us.u, eps.ep, COALESCE(c.x, 0) AS x
        | FROM (SELECT DISTINCT u FROM cells) us CROSS JOIN eps
        | LEFT JOIN cells c ON c.u = us.u AND c.ep = eps.ep),
        |per AS (SELECT u, CAST(sum(x) AS BIGINT) AS s
        | FROM grid GROUP BY 1),
        |st AS (SELECT u, s, s * 1000000 // n AS conf_e6,
        |  CAST(s AS HUGEINT) * (n - s) * 1000000000000 // (n * n) AS v
        | FROM per, ne),
        |sq AS (SELECT u, conf_e6, v,
        |  CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS s0 FROM st),
        |vr AS (SELECT u, conf_e6,
        |  CASE WHEN s0 * s0 > v THEN s0 - 1
        |   WHEN (s0 + 1) * (s0 + 1) <= v THEN s0 + 1
        |   ELSE s0 END AS var_e6
        | FROM sq),
        |reg AS (SELECT conf_e6, var_e6,
        |  CASE WHEN var_e6 > 400000 THEN 'ambiguous'
        |   WHEN conf_e6 >= 666667 THEN 'easy_to_learn'
        |   WHEN conf_e6 <= 333333 THEN 'hard_to_learn'
        |   ELSE 'middle' END AS region FROM vr)
        |SELECT conf_e6 // 100000 AS conf_bucket,
        | var_e6 // 100000 AS var_bucket, region,
        | CAST(count(*) AS BIGINT) AS n_examples
        |FROM reg GROUP BY 1, 2, 3""".stripMargin,

    // q448: same grid, one lead per user, transition census.
    "q448_forgetting" ->
      """WITH cells AS (SELECT user_id AS u,
        |  epoch_ms(ts) // 604800000 AS ep,
        |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |eps AS (SELECT DISTINCT ep FROM cells),
        |grid AS (SELECT us.u, eps.ep, COALESCE(c.x, 0) AS x
        | FROM (SELECT DISTINCT u FROM cells) us CROSS JOIN eps
        | LEFT JOIN cells c ON c.u = us.u AND c.ep = eps.ep),
        |tr AS (SELECT u, x,
        |  lead(x) OVER (PARTITION BY u ORDER BY ep) AS nx FROM grid),
        |per AS (SELECT u,
        |  CAST(sum(CASE WHEN x = 1 AND nx = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_forget,
        |  max(x) AS learned FROM tr GROUP BY 1)
        |SELECT n_forget, learned = 1 AS ever_learned,
        | CAST(count(*) AS BIGINT) AS n_examples
        |FROM per GROUP BY 1, 2""".stripMargin,

    // q416: unit-value prices per period, matched-basket sums in
    // HUGEINT, Fisher via the corrected isqrt.
    "q416_price_index" ->
      """WITH b AS (SELECT l_partkey AS item,
        |  CAST(sum(vc) AS BIGINT) AS bv, CAST(sum(q) AS BIGINT) AS bq
        | FROM (SELECT l_partkey,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
        |   CAST(round(l_quantity) AS BIGINT) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1995)
        | WHERE q > 0 GROUP BY 1),
        |c AS (SELECT l_partkey AS item,
        |  CAST(sum(vc) AS BIGINT) AS cv, CAST(sum(q) AS BIGINT) AS cq
        | FROM (SELECT l_partkey,
        |   CAST(round(l_extendedprice * 100) AS BIGINT) AS vc,
        |   CAST(round(l_quantity) AS BIGINT) AS q
        |  FROM lineitem WHERE year(l_shipdate) = 1996)
        | WHERE q > 0 GROUP BY 1),
        |bp AS (SELECT item, bv // bq AS bp, bq FROM b),
        |cp AS (SELECT item, cv // cq AS cp, cq FROM c),
        |mm AS (SELECT bp.item, bp.bp, bp.bq, cp.cp, cp.cq
        | FROM bp JOIN cp USING (item)),
        |cnt AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM bp
        |   WHERE item NOT IN (SELECT item FROM cp)) AS n_only_base,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cp
        |   WHERE item NOT IN (SELECT item FROM bp)) AS n_only_curr),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |  sum(CAST(cp AS HUGEINT) * bq) AS p1q0,
        |  sum(CAST(bp AS HUGEINT) * bq) AS p0q0,
        |  sum(CAST(cp AS HUGEINT) * cq) AS p1q1,
        |  sum(CAST(bp AS HUGEINT) * cq) AS p0q1 FROM mm),
        |lp AS (SELECT n_matched, n_only_base, n_only_curr,
        |  CASE WHEN p0q0 > 0 THEN
        |   CAST(p1q0 * 1000000 // p0q0 AS BIGINT) END AS laspeyres_e6,
        |  CASE WHEN p0q1 > 0 THEN
        |   CAST(p1q1 * 1000000 // p0q1 AS BIGINT) END AS paasche_e6
        | FROM sums, cnt),
        |f0 AS (SELECT *,
        |  CAST(laspeyres_e6 AS HUGEINT) * paasche_e6 AS f2 FROM lp),
        |f1 AS (SELECT *, CAST(floor(sqrt(CAST(f2 AS DOUBLE)))
        |  AS BIGINT) AS s0 FROM f0)
        |SELECT n_matched, n_only_base, n_only_curr, laspeyres_e6,
        | paasche_e6,
        | CASE WHEN f2 IS NOT NULL THEN
        |  CASE WHEN CAST(s0 AS HUGEINT) * s0 > f2 THEN s0 - 1
        |   WHEN (CAST(s0 AS HUGEINT) + 1) * (s0 + 1) <= f2
        |    THEN s0 + 1
        |   ELSE s0 END END AS fisher_e6
        |FROM f1""".stripMargin,

    // q413: the MoM prior chain with every clamp/NULL branch
    // replayed; smoothing and top-k on the part census.
    "q413_eb_smoothing" ->
      """WITH parts AS (SELECT l_partkey AS item,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |   AS BIGINT) AS x,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM lineitem GROUP BY 1),
        |b AS (SELECT item, x, n, x * 1000000 // n AS raw FROM parts
        | WHERE n > 0),
        |pri AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(raw) AS BIGINT) AS sr,
        |  sum(CAST(raw AS HUGEINT) * raw) AS qr FROM b),
        |p2 AS (SELECT k, sr // k AS m,
        |  CASE WHEN k > 1 THEN
        |   CAST((k * qr - CAST(sr AS HUGEINT) * sr)
        |    // (CAST(k AS HUGEINT) * (k - 1)) AS BIGINT) END AS v
        | FROM pri),
        |p3 AS (SELECT m, CASE WHEN v > 0 THEN
        |  CAST(CAST(m AS HUGEINT) * (1000000 - m) * 1000000 // v
        |   - 1000000 AS BIGINT) END AS ab0 FROM p2),
        |p4 AS (SELECT m, CASE WHEN ab0 > 0 THEN ab0 END AS ab
        | FROM p3),
        |p5 AS (SELECT ab,
        |  CAST(CAST(m AS HUGEINT) * ab // 1000000 AS BIGINT) AS alpha
        | FROM p4)
        |SELECT item, x, n, CAST(raw AS BIGINT) AS raw_e6,
        | CASE WHEN ab IS NOT NULL THEN
        |  CAST((x * 1000000 + alpha) * CAST(1000000 AS HUGEINT)
        |   // (n * 1000000 + ab) AS BIGINT) END AS smoothed_e6,
        | alpha AS alpha_e6, ab AS ab_e6
        |FROM b, p5 ORDER BY n DESC, item LIMIT 10""".stripMargin,

    // q376: the same pinned planner arithmetic — HUGEINT widening,
    // ceil via (num + den − 1) // den, corrected isqrt for the MDE.
    "q376_power_mde" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        | FROM lineitem),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(x AS HUGEINT)) AS s,
        |  sum(CAST(x AS HUGEINT) * x) AS ss FROM b GROUP BY 1),
        |v AS (SELECT g, n, CAST(s // n AS BIGINT) AS mean,
        |  CASE WHEN n < 2 THEN NULL
        |   ELSE CAST((n * ss - s * s)
        |    // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) END
        |   AS var_cents2 FROM a),
        |d AS (SELECT *, CAST(mean // 100 AS BIGINT) AS delta FROM v),
        |r AS (SELECT *, CASE WHEN var_cents2 IS NULL OR delta = 0
        |   THEN NULL
        |   ELSE CAST((CAST(2 AS HUGEINT) * 7851204 * var_cents2
        |      + CAST(delta AS HUGEINT) * delta * 1000000 - 1)
        |     // (CAST(delta AS HUGEINT) * delta * 1000000) AS BIGINT)
        |   END AS n_required,
        |  CASE WHEN var_cents2 IS NULL THEN CAST(0 AS HUGEINT)
        |   ELSE CAST(2 AS HUGEINT) * var_cents2 * 1000000000000 // n
        |   END AS r2 FROM d),
        |s0 AS (SELECT *, CAST(floor(sqrt(CAST(r2 AS DOUBLE)))
        |   AS BIGINT) AS s0 FROM r)
        |SELECT g AS l_returnflag, n, mean, var_cents2, delta,
        | n_required,
        | CASE WHEN var_cents2 IS NULL THEN NULL
        |  ELSE CAST(CAST(2802 AS HUGEINT) * (CASE
        |    WHEN CAST(s0 AS HUGEINT) * s0 > r2 THEN s0 - 1
        |    WHEN (CAST(s0 AS HUGEINT) + 1) * (s0 + 1) <= r2 THEN s0 + 1
        |    ELSE s0 END) // 1000 AS BIGINT) END AS mde_e6
        |FROM s0""".stripMargin,

    // q361: Kish ESS on HUGEINT sums.
    "q361_ess" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS w FROM lineitem
        | WHERE round(l_extendedprice*100) > 0),
        |a AS (SELECT g, count(*) AS n,
        |  sum(CAST(w AS HUGEINT)) AS sw,
        |  sum(CAST(w AS HUGEINT) * w) AS sw2 FROM b GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        | CAST(CAST(sw AS DECIMAL(38,0)) AS VARCHAR) AS sum_w,
        | CAST(CAST(sw2 AS DECIMAL(38,0)) AS VARCHAR) AS sum_w2,
        | CAST(sw * sw * 1000000 // sw2 AS BIGINT) AS ess_e6,
        | CAST(sw * sw * 1000000 // sw2 // n AS BIGINT) AS ess_per_n_e6
        |FROM a""".stripMargin,

    // q329: the WoE/IV double pipeline mirrored term for term (DuckDB
    // BIGINT '/' is double division, matching Spark's Divide).
    "q329_woe_iv" ->
      """WITH c AS (SELECT o_orderpriority AS cat,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos,
        |  sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS neg
        | FROM orders GROUP BY 1),
        |t AS (SELECT sum(pos) AS tp, sum(neg) AS tn FROM c)
        |SELECT cat, CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
        | CAST(round(ln(((pos + 0.5) * tn) / ((neg + 0.5) * tp)) * 1000000.0)
        |   AS BIGINT) AS woe_e6,
        | CAST(round((pos / tp - neg / tn) *
        |   ln(((pos + 0.5) * tn) / ((neg + 0.5) * tp)) * 1000000.0)
        |   AS BIGINT) AS iv_e6
        |FROM c CROSS JOIN t""".stripMargin,

    // q321: the balanced-grid within transform replayed in HUGEINT.
    "q321_twfe" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |dy AS (SELECT DISTINCT day FROM e),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |grid AS (SELECT ty.event_type, dy.day,
        |  coalesce(e.cents, 0) AS cents,
        |  CASE WHEN ty.event_type IN ('purchase', 'click')
        |    AND dy.day >= mid.mid THEN 1 ELSE 0 END AS d
        | FROM ty CROSS JOIN dy CROSS JOIN mid
        | LEFT JOIN e ON e.event_type = ty.event_type AND e.day = dy.day),
        |dims AS (SELECT count(DISTINCT event_type) AS uu,
        |  count(DISTINCT day) AS tt, CAST(sum(cents) AS BIGINT) AS sy,
        |  CAST(sum(d) AS BIGINT) AS sd FROM grid),
        |su AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS su_y,
        |  CAST(sum(d) AS BIGINT) AS su_d FROM grid GROUP BY 1),
        |st AS (SELECT day, CAST(sum(cents) AS BIGINT) AS st_y,
        |  CAST(sum(d) AS BIGINT) AS st_d FROM grid GROUP BY 1),
        |w AS (SELECT
        |  g.cents * dims.uu * dims.tt - su.su_y * dims.uu
        |    - st.st_y * dims.tt + dims.sy AS yt,
        |  g.d * dims.uu * dims.tt - su.su_d * dims.uu
        |    - st.st_d * dims.tt + dims.sd AS dt
        | FROM grid g JOIN su USING (event_type) JOIN st USING (day)
        | CROSS JOIN dims),
        |agg AS (SELECT sum(CAST(yt AS HUGEINT) * dt) AS numd,
        |  sum(CAST(dt AS HUGEINT) * dt) AS dend FROM w)
        |SELECT CAST(CAST(numd AS DECIMAL(38,0)) AS VARCHAR) AS num,
        | CAST(CAST(dend AS DECIMAL(38,0)) AS VARCHAR) AS den,
        | CAST(numd * 1000000 // dend AS BIGINT) AS beta_e6
        |FROM agg""".stripMargin,

    // q314: the identical decomposition arithmetic (// ≡ div: both
    // truncate toward zero, signed terms included).
    "q314_mix_shift" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |  CAST(round(value*100) AS BIGINT) AS cents
        | FROM events WHERE value IS NOT NULL),
        |sp AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |seg AS (SELECT event_type,
        |  CASE WHEN day < mid THEN 1 ELSE 2 END AS p,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS c
        | FROM e, sp GROUP BY 1, 2),
        |tot AS (SELECT p, CAST(sum(n) AS BIGINT) AS np FROM seg
        | GROUP BY 1),
        |wr AS (SELECT event_type, p, n * 1000000 // np AS w,
        |  c * 1000000 // n AS r FROM seg JOIN tot USING (p)),
        |wide AS (SELECT event_type,
        |  coalesce(max(CASE WHEN p = 1 THEN w END), 0) AS w1,
        |  coalesce(max(CASE WHEN p = 1 THEN r END), 0) AS r1,
        |  coalesce(max(CASE WHEN p = 2 THEN w END), 0) AS w2,
        |  coalesce(max(CASE WHEN p = 2 THEN r END), 0) AS r2
        | FROM wr GROUP BY 1)
        |SELECT event_type,
        | CAST((w2 - w1) * r1 // 1000000 AS BIGINT) AS mix_e6,
        | CAST(w1 * (r2 - r1) // 1000000 AS BIGINT) AS rate_e6,
        | CAST((w2 - w1) * (r2 - r1) // 1000000 AS BIGINT) AS inter_e6,
        | CAST(w2 * r2 // 1000000 - w1 * r1 // 1000000
        |  - (w2 - w1) * r1 // 1000000 - w1 * (r2 - r1) // 1000000
        |  - (w2 - w1) * (r2 - r1) // 1000000 AS BIGINT) AS residual_e6
        |FROM wide""".stripMargin,
  )
}
