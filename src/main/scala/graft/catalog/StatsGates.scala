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

/** Statistical estimation: robust stats, quantiles, survival estimators, richness, inequality, tail/moment estimators, sampling audits.
  *
  * 34 gates; hypothesis tests split into StatTestGates in round 15
  * (pure move — every entry verbatim, hashes pinned by the sf0.01
  * sweep). */
object StatsGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(


    // Analytics: robust MAD outlier flagging (|x − median| > 3·MAD) —
    // lower medians by integer rank selection over value histograms, so
    // even the raw-double verdicts hash-gate cross-engine.
    "q70_mad_outliers" -> ((s, dir) =>
      operators.Anomaly.madOutliers(ev(s, dir).where(col("user_id") < 50),
        "user_id", "ts_ms", "value", thresholdNum = 3L)),


    // Gini revenue concentration per event type: exact integer
    // numerator/denominator over the per-user census rank.
    "q163_gini" -> ((s, dir) =>
      Profile.giniConcentration(ev(s, dir), "event_type", "user_id",
        cents(col("value")))
        .withColumnRenamed("sum_val", "sum_cents")),


    // Robust scaling (median/MAD normalization of the quality score):
    // exact integer median from the value census, exact MAD from the
    // deviation census, per-doc deviation emitted as the unreduced
    // (dev, mad) ratio — the outlier-insensitive curriculum scaler.
    "q171_robust_scale" -> ((s, dir) => {
      val q = t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q"))
      val med = ExactQuantiles.histogramPercentiles(q, col("q"), Seq(50))
        .select(col("quantile").as("med"))
      val dev = q.crossJoin(broadcast(med))
        .withColumn("ad", abs(col("q") - col("med")))
      val mad = ExactQuantiles.histogramPercentiles(dev, col("ad"), Seq(50))
        .select(col("quantile").as("mad"))
      dev.crossJoin(broadcast(mad))
        .select(col("doc_id"), col("q"), col("med"),
          (col("q") - col("med")).as("dev"), col("mad"))
    }),


    // Trimmed robust totals: per-returnflag count/sum over only the
    // values inside the exact [p5, p95] envelope — outliers dropped (vs
    // q94's winsorize clip), fences from the bounded-sample machinery,
    // one extra broadcast-fence scan, no sort.
    "q121_trimmed_stats" -> ((s, dir) =>
      operators.ExactQuantiles.trimmedStats(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("x"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("key")),
        Seq("l_returnflag"), col("x"), col("key"), pLow = 5, pHigh = 95)),


    // Exact second-moment profile: per-event-type sufficient statistics
    // (n, Σx, Σy, Σx², Σy², Σxy + the variance/correlation numerators)
    // as pure BIGINTs — one scan, map-side combine, mergeable across
    // shards by addition. x = value cents, y = UTC hour-of-day.
    "q117_moment_profile" -> ((s, dir) =>
      operators.Profile.momentProfile(
        ev(s, dir).select(col("event_type"), cents(col("value")).as("x"),
          ((col("ts_ms") % 86400000L) / 3600000L).cast("long").as("y")),
        "event_type", col("x"), col("y"))),


    // Winsorization on the exact-quantile machinery: per-flag [5, 95]
    // envelope, clip broadcast back onto the scan (no extra shuffle),
    // gated on the aggregate integer profile of the clipped column.
    "q94_winsorize" -> ((s, dir) => {
      val clipped = operators.ExactQuantiles.winsorize(
        t(s, dir, "lineitem"),
        Seq("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")),
        pLow = 5, pHigh = 95, valueAs = "cents_w")
      clipped
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("cents_w")).as("sum_clipped"),
          sum(when(col("cents") < col("cents_w"), 1L).otherwise(0L)).as("n_raised"),
          sum(when(col("cents") > col("cents_w"), 1L).otherwise(0L)).as("n_lowered"))
    }),


    // Simpson concentration index per event type over users — the
    // diversity companion to q179's entropy, exact ppm from pure integer
    // sums: Σ n_i² · 1e6 div n².
    "q199_simpson" -> ((s, dir) =>
      ev(s, dir).groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_users"),
          sum(col("c") * col("c")).as("sum_sq"))
        .withColumn("simpson_ppm", expr("sum_sq * 1000000 div (n * n)"))),


    // Benford first-digit audit of the value column (cents): observed
    // per-digit census vs the literal Benford expectation table — the
    // classic fabricated-data smoke test; one scan, digit from string
    // prefix (values are positive cents, no sign/zero handling needed).
    "q200_benford" -> ((s, dir) => {
      val expected = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
        66947L, 57992L, 51153L, 45757L)
      val expCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${expected(d - 1)}L").mkString(
        "CASE digit ", " ", " ELSE 0L END")
      val digits = ev(s, dir)
        .select(substring(cents(col("value")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      digits
        .crossJoin(broadcast(digits.agg(sum(col("n")).as("total"))))
        .withColumn("obs_ppm", expr("n * 1000000 div total"))
        .withColumn("exp_ppm", expr(expCase))
        .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
        .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
          col("dev_ppm"))
    }),


    // Quantile-quantile distribution mapping (calibration table): exact
    // deciles of the click- and purchase-value distributions matched by
    // percent — the monotone value-mapping a score-calibration or
    // domain-shift correction applies; two census-sized passes on the
    // q175 cumulative-rank machinery, a 9-row join.
    "q194_qq_map" -> ((s, dir) => {
      val q = operators.ExactQuantiles.groupedHistogramPercentiles(
        ev(s, dir).where(col("event_type").isin("click", "purchase")),
        Seq("event_type"), cents(col("value")), (10 to 90 by 10))
      val c = q.where(col("event_type") === "click")
        .select(col("percent"), col("quantile").as("click_cents"))
      val p = q.where(col("event_type") === "purchase")
        .select(col("percent"), col("quantile").as("purchase_cents"))
      c.join(p, "percent")
        .withColumn("shift_cents",
          col("purchase_cents") - col("click_cents"))
    }),


    // Kaplan–Meier life table for time-to-first-purchase after first
    // view, right-censored at the study end (max event ts): per event
    // hour, risk set, events, and the exact 1e6·d div n hazard.
    "q214_kaplan_meier" -> ((s, dir) =>
      operators.Survival.kaplanMeier(
        survivalDurObs(survivalSubjects(s, dir)), col("dur_h"),
        col("obs"))),


    // Largest-remainder apportionment of a (prime) token budget across
    // sources by total characters — quotas sum to the budget EXACTLY,
    // unlike truncation (q104's ≤budget drift). Prime budget forces
    // nontrivial remainders through the rank step.
    "q227_apportion" -> ((s, dir) =>
      operators.CorpusOps.apportion(
        t(s, dir, "documents"), "source", "n_chars", budget = 999983L)),


    // Nelson–Aalen cumulative hazard over the q214 view→purchase
    // durations: additive estimator, exact e9 integers end-to-end (the
    // KM product is a float fold; this curve never leaves BIGINT).
    "q236_nelson_aalen" -> ((s, dir) =>
      operators.Survival.nelsonAalen(
        survivalDurObs(survivalSubjects(s, dir)), col("dur_h"),
        col("obs"))),


    // Split-conformal prediction intervals (Mondrian, per event type):
    // md5-split calibration half fits the predictor and the exact
    // ⌈0.9(n+1)⌉-th residual order statistic q̂ (ExactQuantiles'
    // sample-then-refine selection — no per-group sort), test half
    // audits the distribution-free ≥90% coverage promise.
    "q260_conformal" -> ((s, dir) => {
      val e = ev(s, dir)
      operators.Conformal.splitConformal(e,
        groupCol = col("event_type"),
        isCalib = substring(md5(concat(col("event_id").cast("string"),
          lit("#conf#v1"))), 1, 1) < "8",
        outcome = round(col("value") * 100).cast("long"),
        rowKey = col("event_id"), alphaPct = 90)
        .withColumnRenamed("grp", "event_type")
    }),


    // Systematic PPS (probability-proportional-to-size) sampling:
    // cumulate doc sizes over a fixed order (distributed prefix sum),
    // take every doc whose cumulative range [cum−size, cum) contains a
    // multiple of step = total div 100 — exactly ~100 docs, selection
    // probability ∝ size, zero randomness. The size-weighted corpus
    // downsampler (big docs can't be missed, tiny ones enter at fair
    // odds) — inclusion is a pure integer-division flip.
    "q273_pps_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val cum = operators.PrefixScan.runningSum(d, Seq(col("doc_id")),
        col("n_chars"), "cum")
      val tot = cum.agg(max(col("cum")).as("total"))
        .select(expr("total div 100").as("step"))
      cum.crossJoin(broadcast(tot))
        .where(expr("(cum - 1) div step > (cum - 1 - n_chars) div step"))
        .select(col("doc_id"), col("n_chars"), col("cum"))
    }),


    // FK-closed sampling (referentially consistent test-data
    // extraction): hash-sample the FACT (orders), then close over the
    // graph — lineitems of sampled orders, customers of sampled
    // orders — with semi joins; the anti-join orphan audits prove the
    // closure (all zero). The subsetting recipe that makes a 100 TB
    // lake shrink to a runnable integration fixture.
    "q282_fk_closed_sample" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val sample = o.where(substring(md5(concat(
        col("o_orderkey").cast("string"), lit("#samp#v1"))), 1, 2) < "08")
      val li = t(s, dir, "lineitem").join(
        sample.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val cust = t(s, dir, "customer").join(
        sample.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      val liOrphans = li.join(sample.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      val ordOrphans = sample.join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      def row(name: String, d: DataFrame, orphans: DataFrame) =
        d.agg(count(lit(1)).as("n_rows")).select(lit(name).as("table_name"),
          col("n_rows")).crossJoin(
          orphans.agg(count(lit(1)).as("orphans")))
      row("orders", sample, ordOrphans)
        .unionByName(row("lineitem", li, liOrphans))
        .unionByName(row("customer", cust,
          cust.where(lit(false))))
    }),


    // Weighted discrete quantiles: quantity distribution per return
    // flag, each row weighted by its revenue — the importance-weighted
    // percentile importance-sampled corpora need; exact cum·100 ≥ W·p
    // on DECIMAL(38,0).
    "q360_weighted_quantiles" -> ((s, dir) =>
      operators.CorpusOps.weightedDiscQuantiles(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            round(col("l_quantity")).cast("long").as("qty"),
            cents(col("l_extendedprice")).as("wt")),
        "l_returnflag", "qty", "wt", Seq(25, 50, 75, 95))),


    // Vocabulary richness per source: frequency-of-frequencies → the
    // bias-corrected Chao1 richness lower bound plus the Good–Turing
    // unseen-mass / Turing-coverage estimates — "is another crawl of
    // this source going to surface new vocabulary".
    "q382_chao_richness" -> ((s, dir) =>
      operators.Richness.richnessProfileE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .where(length(col("w")) > 0),
        col("source"), col("w"))
        .select(col("g").as("source"), col("n_tokens"), col("d_types"),
          col("f1"), col("f2"), col("chao1_e6"), col("gt_unseen_ppm"),
          col("coverage_ppm"))),


    // Simple Good–Turing smoothing table (Good 1953; Gale & Sampson
    // 1995) at r ≤ 8 per source: frequency-of-frequencies N_r and the
    // Turing-smoothed r* = (r+1)·N_{r+1}/N_r in truncating e6 — the
    // table an LM smoother consumes for the reliable low counts
    // (q379's Zipf slope covers the tail). Companion to q382's scalar
    // unseen mass.
    "q442_good_turing" -> ((s, dir) =>
      operators.Richness.goodTuringSmoothingE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .where(length(col("w")) > 0),
        col("source"), col("w"), maxR = 8)
        .select(col("g").as("source"), col("r"), col("n_r"),
          col("r_star_e6"))),


    // Hill diversity profile (Hill 1973; Jost 2006): richness ⁰D,
    // Shannon-effective ¹D = exp(H) (micro-nat terms summed exactly,
    // ONE pinned exp), inverse-Simpson ²D = N²/Σc² (pure integers) —
    // per-source effective vocabulary at three rare-type
    // sensitivities, the concentration readout beside q382/q442.
    "q444_hill_numbers" -> ((s, dir) =>
      operators.Richness.hillProfileE6(
        t(s, dir, "documents").select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .where(length(col("w")) > 0),
        col("source"), col("w"))
        .select(col("g").as("source"), col("n_tokens"), col("hill0"),
          col("shannon_e6"), col("hill1_e6"), col("hill2_e6"))),


    // Aalen–Johansen cumulative incidence under competing risks:
    // per user, first purchase (cause 1) vs first error (cause 2)
    // after the first view, hour grain, censored at the stream end —
    // the coherent split of 1−KM that per-cause KM overstates. The
    // truncating product recurrence folds driver-side over the guarded
    // time census; the oracle replays it as a recursive CTE.
    "q385_competing_risks" -> ((s, dir) => {
      // ties purchase-first (pinned): cause 1 iff p_ts ≤ e_ts
      val subj = survivalSubjects(s, dir)
        .select(
          expr("""CASE
                | WHEN p_ts IS NOT NULL AND (e_ts IS NULL OR p_ts <= e_ts)
                |  THEN (p_ts - v_ts) div 3600000
                | WHEN e_ts IS NOT NULL THEN (e_ts - v_ts) div 3600000
                | ELSE (end_ts - v_ts) div 3600000 END""".stripMargin)
            .as("dur_h"),
          expr("""CASE
                | WHEN p_ts IS NOT NULL AND (e_ts IS NULL OR p_ts <= e_ts)
                |  THEN 1
                | WHEN e_ts IS NOT NULL THEN 2
                | ELSE 0 END""".stripMargin).as("cause"))
      operators.Survival.competingRisks(subj, col("dur_h"), col("cause"))
    }),


    // Theil-T revenue inequality across customers, decomposed by
    // nation: per-nation within index + between term (additively
    // exact, unlike Gini) — "is revenue inequality across nations or
    // within them".
    "q387_theil_index" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long")
          .as("nation"))
      operators.Inequality.theilDecompositionE6(
        rev.join(cust, col("o_custkey") === col("c_custkey")),
        col("nation"), col("rev_cents"))
        .withColumnRenamed("g", "nation")
    }),


    // Fano-factor / negative-binomial dispersion audit of the hourly
    // event-type streams (zero hours gap-filled over the global span):
    // Poisson ⇒ Fano = 1; the NB MoM (r, p) describes the burstiness
    // the alerting thresholds must absorb.
    "q388_dispersion" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_type"),
        expr("ts_ms div 3600000").as("h"))
      val span = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val hours = span.select(explode(sequence(col("h0"), col("h1")))
        .as("h"))
      val grid = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(hours))
      val cnt = e.groupBy(col("event_type"), col("h"))
        .agg(count(lit(1)).as("c"))
      val full = grid.join(cnt, Seq("event_type", "h"), "left")
        .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      decStr(operators.Dispersion.fanoNbE6(full, Seq("event_type"),
        col("c")))
    }),


    // Chapman capture–recapture: estimate the part-catalog size from
    // two bimonthly shipment snapshots (Jan–Feb vs Mar–Apr 1996) and
    // audit against the true part count — the crawl-frontier-size
    // estimate next to q382's vocabulary bound.
    "q389_capture_recapture" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def snap(m0: Int, m1: Int) = li
        .where(year(col("l_shipdate")) === 1996 &&
          month(col("l_shipdate")).between(m0, m1))
        .select(col("l_partkey"))
      val truth = t(s, dir, "part")
        .agg(count(lit(1)).cast("long").as("truth"))
      operators.Richness.chapmanE6(snap(1, 2), snap(3, 4), Some(truth))
    }),


    // Hill tail-index of the per-customer revenue distribution
    // (k = 100): how heavy is the whale tail — the order-statistics
    // companion to q379's Zipf HEAD slope.
    "q392_hill_tail" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("x"))
      operators.Inequality.hillTailE6(rev, col("x"), col("o_custkey"),
        k = 100)
    }),


    // Restricted mean survival time to τ = 168 h (one week) on the
    // q214 frame: average conversion-free hours in the first week —
    // the robust effect measure when proportional hazards fail; the
    // KM product folds driver-side over the guarded hour census, the
    // oracle replays it as a recursive CTE.
    "q408_rmst" -> ((s, dir) =>
      operators.Survival.restrictedMeanSurvival(
        survivalDurObs(survivalSubjects(s, dir)), col("dur_h"),
        col("obs"), tau = 168L)),


    // Sample L-moments of order value (dollar grid): λ₁, λ₂, L-CV,
    // L-skewness, L-kurtosis — the order-statistics shape summary,
    // closed-form on the value census (never a row ranking).
    "q417_l_moments" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("__c", cents(col("o_totalprice")))
        .select(expr("__c div 100").as("dollars"))
      operators.LMoments.lMomentsE6(o, col("dollars"))
    }),


    // Little's-law audit over user activity spans: λ·W ≡ the exact
    // interval-integral L by construction; the emitted residual is
    // the gap to GRID-SAMPLED concurrency — does the hourly dashboard
    // alias the workload.
    "q421_littles_law" -> ((s, dir) =>
      operators.Queueing.littlesLawAudit(ev(s, dir), col("user_id"),
        col("ts_ms"))),


    // Chapman capture–recapture (bias-corrected Lincoln–Petersen):
    // users "captured" in even vs odd weeks, the recapture overlap
    // estimates the active population — with the true distinct count
    // riding along as the audit column.
    "q437_capture_recapture" -> ((s, dir) =>
      operators.CaptureRecapture.chapmanAudit(ev(s, dir), col("user_id"),
        expr("(ts_ms div 604800000) % 2 = 0"),
        expr("(ts_ms div 604800000) % 2 = 1"))),


    // Schnabel multi-occasion capture–recapture (Schnabel 1938): days
    // as capture occasions over the user stream, the RUNNING estimate
    // Σ(C·M)·1e6 div ΣR per occasion — watch the population estimate
    // converge as observation rounds accumulate; the k-sample
    // trajectory sibling of q437's two-window Chapman audit.
    "q445_schnabel" -> ((s, dir) =>
      operators.CaptureRecapture.schnabelTrajectoryE6(ev(s, dir),
        col("user_id"), expr("ts_ms div 86400000"))),


    // Horvitz–Thompson audit under Poisson-PPS sampling: orders enter
    // with π ∝ a COARSE size proxy (totalprice cents div 10000,
    // expected m = 200 draws from PolyHash64 uniforms), the HT
    // estimator reconstructs the exact revenue total and population
    // count with the Poisson variance estimate — the "was the sampled
    // dashboard design sound" readout beside q273's systematic PPS.
    "q435_horvitz_thompson" -> ((s, dir) =>
      operators.HorvitzThompson.poissonPpsAudit(
        t(s, dir, "orders")
          .withColumn("cents", cents(col("o_totalprice"))),
        col("o_orderkey"),
        greatest(lit(1L), expr("cents div 10000")), col("cents"),
        expectedSample = 200L, salt = "ht1")),


    // Split-conformal coverage audit (α = 1/10) — q260's guarantee on
    // the CLASSIFICATION side: q260 calibrates ±q̂ intervals on scalar
    // residuals (Conformal.splitConformal); this gate calibrates a
    // per-label conformal quantile of shifted-e3 embedding-centroid
    // distances (cal split vec_id % 5 < 4) and audits held-out
    // coverage vs the ≥ 90% guarantee — the prediction-SET check.
    "q431_conformal" -> ((s, dir) =>
      operators.Similarity.conformalCoverageE6(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", pmod(col("vec_id"), lit(5L)) < 4L,
        alphaNum = 1L, alphaDen = 10L)),


    // Deterministic Poisson bootstrap CI (Chamandy 2012 — the
    // production one-pass bootstrap) for price-per-unit per return
    // flag: 40 replicates via pinned Lehmer Poisson(1) weights, e6
    // replicate ratios, order-statistic interval (ranks 2 and 39).
    "q377_poisson_bootstrap" -> ((s, dir) =>
      operators.PairedTests.poissonBootstrapRatioE6(
        t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_orderkey") * 131L + col("l_linenumber") * 7L +
          col("l_partkey"),
        cents(col("l_extendedprice")),
        round(col("l_quantity")).cast("long"), reps = 40)),


    // Delete-one-bucket jackknife for a ratio metric (price cents per
    // unit quantity) per return flag, 32 order-hash buckets — the
    // production error bar for ratio metrics, where the delta method
    // is the approximation and the bucket jackknife is what ships.
    "q366_jackknife_ratio" -> ((s, dir) =>
      decStr(operators.PairedTests.jackknifeRatioE6(
        t(s, dir, "lineitem"), Seq("l_returnflag"),
        pmod(col("l_orderkey"), lit(32L)),
        cents(col("l_extendedprice")), round(col("l_quantity")).cast("long")))),


    // Poisson bootstrap CI (Chamandy et al. 2012 — THE at-scale
    // bootstrap: no resample materialization, each row independently
    // carries Poisson(1) multiplicities per replicate) on mean event
    // cents per type: B=64 replicates, weights from a splitMix64 draw
    // against the 2^63-scaled Poisson CDF ladder (indicator sums — no
    // branching), replicate means e6-truncated, CI = ranks 2/63 of the
    // sorted means (~95%). The oracle replays hash, ladder, and ranks.
    "q310_poisson_bootstrap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      functions.PolyHash64.register(s)
      val b = 64
      val base = ev(s, dir).where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("x"))
      val rep = base.select(col("event_id"), col("event_type"), col("x"),
          explode(sequence(lit(0), lit(b - 1))).as("b"))
        .withColumn("u", expr(
          "shiftrightunsigned(graft_splitmix64(event_id + b * 2654435769L), 1)"))
        .withColumn("w", q310Thresholds.map(th =>
          when(col("u") >= th, 1L).otherwise(0L)).reduce(_ + _))
      val means = rep.groupBy(col("event_type"), col("b"))
        .agg(sum(col("w")).as("nw"), sum(col("w") * col("x")).as("sw"))
        .where(col("nw") > 0)
        .withColumn("mean_e6", expr("sw * 1000000L div nw"))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(col("mean_e6"), col("b"))
      val ci = means.withColumn("rk", row_number().over(rk))
        .groupBy(col("event_type"))
        .agg(max(when(col("rk") === 2, col("mean_e6"))).as("ci_lo_e6"),
          max(when(col("rk") === b - 1, col("mean_e6"))).as("ci_hi_e6"))
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("sum(x) * 1000000L div count(1)").as("mean_e6"))
        .join(ci, "event_type")
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(


    // lower medians by the same integer rank selection (min v with
    // 2·cum ≥ n); deviation = one IEEE subtraction, threshold = one
    // multiply — verdicts on raw doubles stay bit-identical
    "q70_mad_outliers" ->
      """WITH e AS (
        | SELECT user_id AS k, epoch_ms(ts) AS ts, value AS v
        | FROM events WHERE user_id < 50),
        |h1 AS (SELECT k, v, count(*) AS c FROM e GROUP BY 1, 2),
        |c1 AS (SELECT k, v,
        |  sum(c) OVER (PARTITION BY k ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(c) OVER (PARTITION BY k) AS n FROM h1),
        |med AS (SELECT k, min(CASE WHEN cum*2 >= n THEN v END) AS med
        | FROM c1 GROUP BY k),
        |d AS (SELECT e.k, e.ts, e.v, abs(e.v - med.med) AS dev
        | FROM e JOIN med USING (k)),
        |h2 AS (SELECT k, dev, count(*) AS c FROM d GROUP BY 1, 2),
        |c2 AS (SELECT k, dev,
        |  sum(c) OVER (PARTITION BY k ORDER BY dev
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(c) OVER (PARTITION BY k) AS n FROM h2),
        |mad AS (SELECT k, min(CASE WHEN cum*2 >= n THEN dev END) AS mad
        | FROM c2 GROUP BY k)
        |SELECT d.k AS user_id, d.ts AS ts_ms, d.v AS value,
        | d.dev AS deviation, (d.dev * 1.0 > mad.mad * 3.0) AS is_outlier
        |FROM d JOIN mad USING (k)""".stripMargin,


    // q163: per-user census, (y, user) rank, the closed-form ratio.
    "q163_gini" ->
      """WITH p AS (SELECT event_type, user_id,
        |  sum(CAST(round(value * 100) AS BIGINT)) AS y
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY y, user_id) AS i FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS sum_cents,
        |  CAST(2 * sum(i * y) - (count(*) + 1) * sum(y) AS BIGINT)
        |    AS gini_num,
        |  CAST(count(*) * sum(y) AS BIGINT) AS gini_den
        |FROM r GROUP BY 1""".stripMargin,


    // q171: census medians for value and deviation, unreduced (dev, mad).
    "q171_robust_scale" ->
      s"""WITH q AS (SELECT doc_id, $qualityExprSql AS q FROM documents),
         |c AS (SELECT q AS v, count(*) AS n FROM q GROUP BY 1),
         |w AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
         |  sum(n) OVER () AS nn FROM c),
         |med AS (SELECT min(v) AS med FROM w WHERE cum * 100 >= nn * 50),
         |d AS (SELECT doc_id, q, med, abs(q - med) AS ad FROM q, med),
         |c2 AS (SELECT ad AS v, count(*) AS n FROM d GROUP BY 1),
         |w2 AS (SELECT v, sum(n) OVER (ORDER BY v) AS cum,
         |  sum(n) OVER () AS nn FROM c2),
         |mad AS (SELECT min(v) AS mad FROM w2 WHERE cum * 100 >= nn * 50)
         |SELECT doc_id, q, CAST(med AS BIGINT) AS med,
         |  CAST(q - med AS BIGINT) AS dev, CAST(mad AS BIGINT) AS mad
         |FROM d, mad""".stripMargin,


    // q121: rank-selected [p5, p95] fences per group (value at rank
    // ceil(n·p/100) in (x, key) order = smallest x with cum ≥ target),
    // then plain filtered aggregates — outliers dropped, all integers.
    "q121_trimmed_stats" ->
      """WITH v AS (SELECT l_returnflag AS g,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS x,
        |  l_orderkey*10 + l_linenumber AS key FROM lineitem),
        |r AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x, key) AS rn,
        |      count(*) OVER (PARTITION BY g) AS n FROM v),
        |c AS (SELECT g,
        |   max(CASE WHEN rn = (n*5 + 99)//100 THEN x END) AS q_lo,
        |   max(CASE WHEN rn = (n*95 + 99)//100 THEN x END) AS q_hi
        |  FROM r GROUP BY g)
        |SELECT g AS l_returnflag, q_lo, q_hi,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(*) FILTER (x >= q_lo AND x <= q_hi) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(x) FILTER (x >= q_lo AND x <= q_hi), 0) AS BIGINT)
        |    AS sum_kept
        |FROM v JOIN c USING (g) GROUP BY g, q_lo, q_hi""".stripMargin,


    // q117: sufficient statistics as exact BIGINTs; x = cents, y = UTC
    // hour-of-day; numerators n·Σ·· − Σ·Σ.
    "q117_moment_profile" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x*x) AS BIGINT) AS sum_xx,
        |  CAST(sum(y*y) AS BIGINT) AS sum_yy,
        |  CAST(sum(x*y) AS BIGINT) AS sum_xy,
        |  CAST(count(*)*sum(x*x) - sum(x)*sum(x) AS BIGINT) AS var_x_num,
        |  CAST(count(*)*sum(y*y) - sum(y)*sum(y) AS BIGINT) AS var_y_num,
        |  CAST(count(*)*sum(x*y) - sum(x)*sum(y) AS BIGINT) AS corr_num
        |FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS x,
        |       (epoch_ms(ts) % 86400000) // 3600000 AS y FROM events)
        |GROUP BY event_type""".stripMargin,


    "q94_winsorize" ->
      """WITH base AS (
        | SELECT l_returnflag AS grp, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        | FROM lineitem),
        |n AS (SELECT grp, count(*) AS n FROM base GROUP BY 1),
        |hist AS (SELECT grp, v, count(*) AS c FROM base GROUP BY 1, 2),
        |cum AS (
        | SELECT grp, v,
        |  SUM(c) OVER (PARTITION BY grp ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM hist),
        |p AS (SELECT * FROM (VALUES (5), (95)) t(percent)),
        |qv AS (
        | SELECT cum.grp, p.percent, MIN(cum.v) AS q
        | FROM cum JOIN n ON n.grp = cum.grp
        | JOIN p ON cum.cum >= ((n.n * p.percent + 99) // 100)
        | GROUP BY 1, 2),
        |b AS (
        | SELECT grp,
        |  MIN(CASE WHEN percent = 5 THEN q END) AS qlo,
        |  MAX(CASE WHEN percent = 95 THEN q END) AS qhi
        | FROM qv GROUP BY 1)
        |SELECT base.grp AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(LEAST(GREATEST(v, qlo), qhi)) AS BIGINT) AS sum_clipped,
        |  CAST(SUM(CASE WHEN v < qlo THEN 1 ELSE 0 END) AS BIGINT) AS n_raised,
        |  CAST(SUM(CASE WHEN v > qhi THEN 1 ELSE 0 END) AS BIGINT) AS n_lowered
        |FROM base JOIN b ON b.grp = base.grp
        |GROUP BY 1""".stripMargin,


    // q199: pure integer Σn², ppm by cross-multiplication-free div.
    "q199_simpson" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS c FROM events
        | GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
        | CAST(count(*) AS BIGINT) AS n_users,
        | CAST(sum(c * c) AS BIGINT) AS sum_sq,
        | CAST(sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
        |   AS simpson_ppm
        |FROM c GROUP BY 1""".stripMargin,


    // q200: literal Benford ppm table, first digit of positive cents.
    "q200_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(round(value * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        | FROM events),
        |n AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM n)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        | CAST(n * 1000000 // t.total AS BIGINT) AS obs_ppm,
        | CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |  WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |  WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |  WHEN 9 THEN 45757 ELSE 0 END AS BIGINT) AS exp_ppm,
        | CAST(abs(n * 1000000 // t.total - CASE digit WHEN 1 THEN 301030
        |  WHEN 2 THEN 176091 WHEN 3 THEN 124939 WHEN 4 THEN 96910
        |  WHEN 5 THEN 79181 WHEN 6 THEN 66947 WHEN 7 THEN 57992
        |  WHEN 8 THEN 51153 WHEN 9 THEN 45757 ELSE 0 END) AS BIGINT)
        |   AS dev_ppm
        |FROM n CROSS JOIN t""".stripMargin,


    // q194: the q175 cumulative-rank rule per type, decile join.
    "q194_qq_map" ->
      """WITH e AS (SELECT event_type,
        |  CAST(round(value * 100) AS BIGINT) AS v FROM events
        | WHERE event_type IN ('click', 'purchase')),
        |h AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT *, sum(c) OVER (PARTITION BY event_type
        |    ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(c) OVER (PARTITION BY event_type) AS n FROM h),
        |x AS (SELECT event_type, v, p.percent FROM w,
        |  (VALUES (10),(20),(30),(40),(50),(60),(70),(80),(90)) p(percent)
        | WHERE cum * 100 >= n * p.percent),
        |q AS (SELECT event_type, percent, min(v) AS quantile
        |      FROM x GROUP BY 1, 2)
        |SELECT CAST(c.percent AS BIGINT) AS percent,
        | CAST(c.quantile AS BIGINT) AS click_cents,
        | CAST(p.quantile AS BIGINT) AS purchase_cents,
        | CAST(p.quantile - c.quantile AS BIGINT) AS shift_cents
        |FROM q c JOIN q p ON p.percent = c.percent
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,


    // q214: KM life table, hour resolution, censor at max event ts.
    "q214_kaplan_meier" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        |v AS (SELECT user_id, min(ts_ms) AS v_ts FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT v.user_id, v.v_ts, min(p.ts_ms) AS p_ts
        | FROM v LEFT JOIN e p ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND p.ts_ms >= v.v_ts
        | GROUP BY 1, 2),
        |endt AS (SELECT max(ts_ms) AS end_ts FROM e),
        |subj AS (SELECT CASE WHEN p_ts IS NOT NULL
        |   THEN (p_ts - v_ts) // 3600000
        |   ELSE (end_ts - v_ts) // 3600000 END AS t,
        |  p_ts IS NOT NULL AS obs FROM fp CROSS JOIN endt),
        |perT AS (SELECT t, count(*) AS n_at,
        |  sum(CASE WHEN obs THEN 1 ELSE 0 END) AS n_events
        | FROM subj GROUP BY t),
        |km AS (SELECT t, n_at, n_events,
        |  sum(n_at) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        | FROM perT)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        | CAST(n_events AS BIGINT) AS n_events,
        | CAST(1000000 * n_events // n_risk AS BIGINT) AS hazard_ppm
        |FROM km WHERE n_events > 0""".stripMargin,


    // q227: Hamilton apportionment replay in HUGEINT; quotas must sum to
    // the prime budget exactly.
    "q227_apportion" ->
      """WITH g AS (
        | SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
        | FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(weight) AS HUGEINT) AS W FROM g),
        |a AS (
        | SELECT source, weight,
        |  (CAST(999983 AS HUGEINT) * weight) // W AS base,
        |  (CAST(999983 AS HUGEINT) * weight) % W AS rem
        | FROM g, t),
        |d AS (
        | SELECT *, 999983 - sum(base) OVER () AS deficit,
        |  row_number() OVER (ORDER BY rem DESC, source) AS rk
        | FROM a)
        |SELECT source, weight,
        | CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |  AS quota
        |FROM d""".stripMargin,


    // q236: the q214 life table plus the e9 additive cumulation.
    "q236_nelson_aalen" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        |v AS (SELECT user_id, min(ts_ms) AS v_ts FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT v.user_id, v.v_ts, min(p.ts_ms) AS p_ts
        | FROM v LEFT JOIN e p ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND p.ts_ms >= v.v_ts
        | GROUP BY 1, 2),
        |endt AS (SELECT max(ts_ms) AS end_ts FROM e),
        |subj AS (SELECT CASE WHEN p_ts IS NOT NULL
        |   THEN (p_ts - v_ts) // 3600000
        |   ELSE (end_ts - v_ts) // 3600000 END AS t,
        |  p_ts IS NOT NULL AS obs FROM fp CROSS JOIN endt),
        |perT AS (SELECT t, count(*) AS n_at,
        |  sum(CASE WHEN obs THEN 1 ELSE 0 END) AS n_events
        | FROM subj GROUP BY t),
        |na AS (SELECT t, n_at, n_events,
        |  sum(n_at) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        | FROM perT),
        |inc AS (SELECT t, n_risk, n_events,
        |  CAST(1000000000 * n_events // n_risk AS BIGINT) AS inc_e9
        | FROM na),
        |cum AS (SELECT t, n_risk, n_events, inc_e9,
        |  sum(CASE WHEN n_events > 0 THEN inc_e9 ELSE 0 END)
        |   OVER (ORDER BY t ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS cum_hazard_e9
        | FROM inc)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        | CAST(n_events AS BIGINT) AS n_events, inc_e9,
        | CAST(cum_hazard_e9 AS BIGINT) AS cum_hazard_e9
        |FROM cum WHERE n_events > 0""".stripMargin,


    // q260: same md5 split, calibration mean via floor-div, q̂ as the
    // capped ⌈0.9(n+1)⌉-th order statistic off a cumulative histogram.
    "q260_conformal" ->
      """WITH b AS (SELECT event_type,
        |  CAST(round(value*100) AS BIGINT) AS y,
        |  substr(md5(CAST(event_id AS VARCHAR) || '#conf#v1'), 1, 1) < '8'
        |    AS cal
        | FROM events WHERE value IS NOT NULL),
        |p AS (SELECT event_type, count(*) AS n_cal,
        |  CAST(sum(y) // count(*) AS BIGINT) AS pred
        | FROM b WHERE cal GROUP BY 1),
        |r AS (SELECT b.event_type, abs(y - pred) AS r, cal, n_cal, pred
        | FROM b JOIN p USING (event_type)),
        |t AS (SELECT event_type, any_value(n_cal) AS n,
        |  least(any_value(n_cal),
        |        ((any_value(n_cal) + 1) * 90 + 99) // 100) AS target
        | FROM r WHERE cal GROUP BY 1),
        |h AS (SELECT event_type, r, count(*) AS c
        | FROM r WHERE cal GROUP BY 1, 2),
        |cum AS (SELECT event_type, r,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY r) AS cum FROM h),
        |q AS (SELECT cum.event_type, min(r) AS qhat
        | FROM cum JOIN t USING (event_type)
        | WHERE cum >= target GROUP BY 1)
        |SELECT r.event_type, any_value(pred) AS pred,
        |  any_value(n_cal) AS n_cal, any_value(qhat) AS qhat,
        |  count(*) AS n_test,
        |  CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered
        |FROM r JOIN q USING (event_type)
        |WHERE NOT cal GROUP BY 1""".stripMargin,


    // q273: the cumsum window + the same integer-division flip.
    "q273_pps_sample" ->
      """WITH c AS (SELECT doc_id, n_chars,
        |  CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum
        | FROM documents),
        |t AS (SELECT max(cum) // 100 AS step FROM c)
        |SELECT doc_id, n_chars, cum FROM c, t
        |WHERE (cum - 1) // step > (cum - 1 - n_chars) // step""".stripMargin,


    // q282: same hash sample, same closure + audits.
    "q282_fk_closed_sample" ->
      """WITH s AS (SELECT * FROM orders
        | WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '#samp#v1'),
        |   1, 2) < '08'),
        |li AS (SELECT * FROM lineitem
        | WHERE l_orderkey IN (SELECT o_orderkey FROM s)),
        |cu AS (SELECT * FROM customer
        | WHERE c_custkey IN (SELECT o_custkey FROM s))
        |SELECT 'orders' AS table_name, (SELECT count(*) FROM s) AS n_rows,
        | (SELECT count(*) FROM s WHERE o_custkey NOT IN
        |   (SELECT c_custkey FROM cu)) AS orphans
        |UNION ALL SELECT 'lineitem', (SELECT count(*) FROM li),
        | (SELECT count(*) FROM li WHERE l_orderkey NOT IN
        |   (SELECT o_orderkey FROM s))
        |UNION ALL SELECT 'customer', (SELECT count(*) FROM cu), 0"""
        .stripMargin,


    // q382: frequency-of-frequencies → Chao1 (bias-corrected) and
    // Good–Turing missing mass, all-integer in HUGEINT.
    "q382_chao_richness" ->
      """WITH tok AS (SELECT source, unnest(list_filter(
        |   regexp_split_to_array(trim(lower(text)), '\s+'),
        |   x -> length(x) > 0)) AS w
        | FROM documents),
        |ty AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS d_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        | FROM ty GROUP BY 1)
        |SELECT source, n_tokens, d_types, f1, f2,
        | CAST(d_types * 1000000 + CAST(f1 AS HUGEINT) * (f1 - 1)
        |  * 1000000 // (2 * (f2 + 1)) AS BIGINT) AS chao1_e6,
        | CAST(f1 * 1000000 // n_tokens AS BIGINT) AS gt_unseen_ppm,
        | CAST(1000000 - f1 * 1000000 // n_tokens AS BIGINT)
        |  AS coverage_ppm
        |FROM st""".stripMargin,


    // q442: the r+1 self-join over the per-source frequency spectrum,
    // HUGEINT truncating arithmetic.
    "q442_good_turing" ->
      """WITH tok AS (SELECT source AS g, unnest(list_filter(
        |   regexp_split_to_array(trim(lower(text)), '\s+'),
        |   x -> length(x) > 0)) AS w
        | FROM documents),
        |ty AS (SELECT g, w, CAST(count(*) AS BIGINT) AS r
        | FROM tok GROUP BY 1, 2),
        |spec AS (SELECT g, r, CAST(count(*) AS BIGINT) AS n_r
        | FROM ty GROUP BY 1, 2)
        |SELECT lo.g AS source, lo.r, lo.n_r,
        | CAST(CAST(lo.r + 1 AS HUGEINT) * COALESCE(hi.n_r, 0) * 1000000
        |  // lo.n_r AS BIGINT) AS r_star_e6
        |FROM (SELECT * FROM spec WHERE r <= 8) lo
        |LEFT JOIN spec hi ON hi.g = lo.g AND hi.r = lo.r + 1""".stripMargin,


    // q444: micro-nat entropy terms summed exactly, one exp per group;
    // inverse Simpson in pure HUGEINT.
    "q444_hill_numbers" ->
      """WITH tok AS (SELECT source AS g, unnest(list_filter(
        |   regexp_split_to_array(trim(lower(text)), '\s+'),
        |   x -> length(x) > 0)) AS w
        | FROM documents),
        |ty AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
        | FROM tok GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM ty GROUP BY 1),
        |terms AS (SELECT ty.g, tot.n, ty.c,
        |  CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |   * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |   * 1000000.0) AS BIGINT) AS h_term
        | FROM ty JOIN tot ON tot.g = ty.g),
        |agg AS (SELECT g, n, CAST(count(*) AS BIGINT) AS hill0,
        |  CAST(sum(h_term) AS BIGINT) AS shannon_e6,
        |  sum(CAST(c AS HUGEINT) * c) AS c2
        | FROM terms GROUP BY 1, 2)
        |SELECT g AS source, n AS n_tokens, hill0, shannon_e6,
        | CAST(round(exp(CAST(shannon_e6 AS DOUBLE) / 1000000.0)
        |  * 1000000.0) AS BIGINT) AS hill1_e6,
        | CAST(CAST(n AS HUGEINT) * n * 1000000 // c2 AS BIGINT)
        |  AS hill2_e6
        |FROM agg""".stripMargin,


    // q385: the q214 subject frame widened to two causes; the
    // truncating AJ product recurrence replayed as a recursive CTE
    // over the ranked time census in HUGEINT.
    "q385_competing_risks" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_type,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        |v AS (SELECT user_id, min(ts_ms) AS v_ts FROM e
        | WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT v.user_id, v.v_ts, min(p.ts_ms) AS p_ts
        | FROM v LEFT JOIN e p ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND p.ts_ms >= v.v_ts
        | GROUP BY 1, 2),
        |fb AS (SELECT fp.user_id, fp.v_ts, fp.p_ts,
        |  min(er.ts_ms) AS e_ts
        | FROM fp LEFT JOIN e er ON er.user_id = fp.user_id
        |  AND er.event_type = 'error' AND er.ts_ms >= fp.v_ts
        | GROUP BY 1, 2, 3),
        |endt AS (SELECT max(ts_ms) AS end_ts FROM e),
        |subj AS (SELECT
        |  CASE WHEN p_ts IS NOT NULL AND (e_ts IS NULL OR p_ts <= e_ts)
        |    THEN (p_ts - v_ts) // 3600000
        |   WHEN e_ts IS NOT NULL THEN (e_ts - v_ts) // 3600000
        |   ELSE (end_ts - v_ts) // 3600000 END AS t,
        |  CASE WHEN p_ts IS NOT NULL AND (e_ts IS NULL OR p_ts <= e_ts)
        |    THEN 1
        |   WHEN e_ts IS NOT NULL THEN 2 ELSE 0 END AS k
        | FROM fb CROSS JOIN endt),
        |perT AS (SELECT t, count(*) AS n_at,
        |  sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS d1,
        |  sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS d2
        | FROM subj GROUP BY 1),
        |rk AS (SELECT t, n_at, d1, d2,
        |  row_number() OVER (ORDER BY t) AS r,
        |  sum(n_at) OVER (ORDER BY t DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        | FROM perT),
        |walk(r, s, c1, c2) AS (
        | SELECT CAST(0 AS BIGINT), CAST(1000000 AS HUGEINT),
        |  CAST(0 AS HUGEINT), CAST(0 AS HUGEINT)
        | UNION ALL
        | SELECT rk.r,
        |  w.s * (rk.n_risk - rk.d1 - rk.d2) // rk.n_risk,
        |  w.c1 + w.s * rk.d1 // rk.n_risk,
        |  w.c2 + w.s * rk.d2 // rk.n_risk
        | FROM walk w JOIN rk ON rk.r = w.r + 1)
        |SELECT rk.t, CAST(rk.n_risk AS BIGINT) AS n_risk,
        | CAST(rk.d1 AS BIGINT) AS d1, CAST(rk.d2 AS BIGINT) AS d2,
        | CAST(wp.s AS BIGINT) AS s_minus_e6,
        | CAST(wc.c1 AS BIGINT) AS cif1_e6,
        | CAST(wc.c2 AS BIGINT) AS cif2_e6
        |FROM rk JOIN walk wp ON wp.r = rk.r - 1
        |JOIN walk wc ON wc.r = rk.r
        |WHERE rk.d1 + rk.d2 > 0""".stripMargin,


    // q387: the pinned double pipeline (the q100 ln rule) mirrored
    // character-for-character; integer sufficient stats everywhere
    // else.
    "q387_theil_index" ->
      """WITH rev AS (SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS x
        | FROM orders GROUP BY 1),
        |u AS (SELECT CAST(c_nationkey AS BIGINT) AS g, x
        | FROM rev JOIN customer ON o_custkey = c_custkey WHERE x > 0),
        |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |  CAST(sum(x) AS BIGINT) AS xg FROM u GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |  CAST(sum(xg) AS BIGINT) AS x FROM gs),
        |wt AS (SELECT u.g,
        |  CAST(round(CAST(u.x AS DOUBLE) * 1000000.0 / gs.xg
        |   * ln(CAST(u.x AS DOUBLE) * gs.ng / gs.xg)) AS BIGINT) AS t
        | FROM u JOIN gs USING (g)),
        |wi AS (SELECT g, CAST(sum(t) AS BIGINT) AS theil_within_e6
        | FROM wt GROUP BY 1)
        |SELECT g AS nation, ng AS n, xg AS sum_v,
        | CAST(CAST(xg AS HUGEINT) * 1000000 // x AS BIGINT) AS share_e6,
        | theil_within_e6,
        | CAST(round(CAST(xg AS DOUBLE) * 1000000.0 / x
        |  * ln(CAST(xg AS DOUBLE) * tot.n / (CAST(x AS DOUBLE) * ng)))
        |  AS BIGINT) AS between_term_e6
        |FROM gs JOIN wi USING (g) CROSS JOIN tot""".stripMargin,


    // q388: zero-filled hourly grid, then the cleared MoM identities
    // in HUGEINT — one truncating division per statistic.
    "q388_dispersion" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h
        | FROM events),
        |span AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |hours AS (SELECT unnest(generate_series(h0, h1)) AS h
        | FROM span),
        |grid AS (SELECT t.event_type, hours.h
        | FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours),
        |cnt AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
        | FROM e GROUP BY 1, 2),
        |f AS (SELECT g.event_type, coalesce(cnt.c, 0) AS c
        | FROM grid g LEFT JOIN cnt
        |  ON cnt.event_type = g.event_type AND cnt.h = g.h),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(c) AS BIGINT) AS s,
        |  sum(CAST(c AS HUGEINT) * c) AS q FROM f GROUP BY 1),
        |vn AS (SELECT *, n * q - CAST(s AS HUGEINT) * s AS vnum
        | FROM st)
        |SELECT event_type, n, s,
        | CAST(CAST(s AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_e6,
        | CASE WHEN s > 0 THEN
        |  CAST(vnum * 1000000 // (n * CAST(s AS HUGEINT)) AS BIGINT)
        | END AS fano_e6,
        | CASE WHEN vnum > n * CAST(s AS HUGEINT) THEN
        |  CAST(CAST(s AS HUGEINT) * s * 1000000
        |   // (vnum - n * CAST(s AS HUGEINT)) AS BIGINT)
        | END AS nb_r_e6,
        | CASE WHEN vnum > 0 THEN
        |  CAST(n * CAST(s AS HUGEINT) * 1000000 // vnum AS BIGINT)
        | END AS nb_p_e6
        |FROM vn""".stripMargin,


    // q389: Chapman with the true part count riding along for err_ppm.
    "q389_capture_recapture" ->
      """WITH s1 AS (SELECT DISTINCT l_partkey AS k FROM lineitem
        | WHERE year(l_shipdate) = 1996
        |  AND month(l_shipdate) BETWEEN 1 AND 2),
        |s2 AS (SELECT DISTINCT l_partkey AS k FROM lineitem
        | WHERE year(l_shipdate) = 1996
        |  AND month(l_shipdate) BETWEEN 3 AND 4),
        |nn AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1 JOIN s2 USING (k))
        |   AS m,
        |  (SELECT CAST(count(*) AS BIGINT) FROM part) AS truth),
        |est AS (SELECT *,
        |  CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) * 1000000
        |   // (m + 1) - 1000000 AS BIGINT) AS chapman_e6 FROM nn)
        |SELECT n1, n2, m, chapman_e6, truth,
        | CAST(CAST(abs(chapman_e6 - truth * 1000000) AS HUGEINT)
        |  * 1000000 // (truth * 1000000) AS BIGINT) AS err_ppm
        |FROM est""".stripMargin,


    // q421: user spans, ceil-aligned hourly grid, half-open
    // containment; the λW ≡ L identity is construction-exact, the
    // residual audits the grid sampling.
    "q421_littles_law" ->
      """WITH sp AS (SELECT user_id AS u,
        |  CAST(min(epoch_ms(ts)) AS BIGINT) AS s,
        |  CAST(max(epoch_ms(ts)) AS BIGINT) AS e
        | FROM events GROUP BY 1),
        |sp2 AS (SELECT u, s, e, e - s AS dur FROM sp),
        |hz AS (SELECT min(s) AS h0, max(e) AS h1,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(dur) AS BIGINT) AS sumdur FROM sp2),
        |h2 AS (SELECT *, h1 - h0 AS hms FROM hz),
        |grid AS (SELECT unnest(generate_series(
        |  (h0 + 3599999) // 3600000, h1 // 3600000)) * 3600000 AS g
        | FROM h2),
        |act AS (SELECT CAST(count(*) AS BIGINT) AS n_active
        | FROM sp2, grid WHERE s <= g AND g < e),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_grid FROM grid),
        |f AS (SELECT n AS n_units, hms AS horizon_ms, n_grid,
        |  CASE WHEN hms > 0 THEN CAST(CAST(n AS HUGEINT) * 3600000
        |   * 1000000 // hms AS BIGINT) END AS lambda_per_hour_e6,
        |  CAST(sumdur // n AS BIGINT) AS w_ms,
        |  CASE WHEN hms > 0 THEN CAST(CAST(sumdur AS HUGEINT)
        |   * 1000000 // hms AS BIGINT) END AS l_exact_e6,
        |  CASE WHEN n_grid > 0 THEN
        |   CAST(n_active * 1000000 // n_grid AS BIGINT) END
        |   AS l_grid_e6
        | FROM h2, act, ng)
        |SELECT *, CASE WHEN l_exact_e6 > 0 THEN
        |  CAST(CAST(abs(l_grid_e6 - l_exact_e6) AS HUGEINT) * 1000000
        |   // l_exact_e6 AS BIGINT) END AS grid_residual_ppm
        |FROM f""".stripMargin,


    "q435_horvitz_thompson" -> q435OracleSql,


    // q437: occupancy bits per user, Chapman algebra in HUGEINT.
    "q437_capture_recapture" ->
      """WITH b AS (SELECT user_id AS u,
        |  max(CASE WHEN (epoch_ms(ts) // 604800000) % 2 = 0
        |    THEN 1 ELSE 0 END) AS in1,
        |  max(CASE WHEN (epoch_ms(ts) // 604800000) % 2 = 1
        |    THEN 1 ELSE 0 END) AS in2
        | FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
        |  CAST(sum(in1) AS BIGINT) AS n1,
        |  CAST(sum(in2) AS BIGINT) AS n2,
        |  CAST(sum(in1 * in2) AS BIGINT) AS m FROM b)
        |SELECT n_true, n1, n2, m,
        | CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1
        |  AS BIGINT) AS chapman_nhat,
        | CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) * (n1 - m) * (n2 - m)
        |   // (CAST(m + 1 AS HUGEINT) * (m + 1) * (m + 2)) AS BIGINT)
        |  AS var_nhat
        |FROM s""".stripMargin,


    // q445: first-capture per user, occasion census, cumulative
    // windows; HUGEINT truncating running estimate.
    "q445_schnabel" ->
      """WITH caps AS (SELECT DISTINCT user_id AS u,
        |  epoch_ms(ts) // 86400000 AS t FROM events),
        |fc AS (SELECT u, min(t) AS ft FROM caps GROUP BY 1),
        |occ AS (SELECT t,
        |  CAST(count(*) AS BIGINT) AS c_t,
        |  CAST(sum(CASE WHEN ft < t THEN 1 ELSE 0 END) AS BIGINT) AS r_t,
        |  CAST(sum(CASE WHEN ft = t THEN 1 ELSE 0 END) AS BIGINT) AS nw
        | FROM caps JOIN fc USING (u) GROUP BY 1),
        |run0 AS (SELECT t, c_t, r_t,
        |  COALESCE(sum(nw) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |   0) AS m_t
        | FROM occ),
        |run AS (SELECT t, c_t, r_t, m_t,
        |  sum(CAST(c_t AS HUGEINT) * m_t)
        |   OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_cm,
        |  sum(r_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_r
        | FROM run0)
        |SELECT t, c_t, r_t, CAST(m_t AS BIGINT) AS m_t,
        | CAST(cum_cm AS BIGINT) AS cum_cm,
        | CAST(cum_r AS BIGINT) AS cum_r,
        | CASE WHEN cum_r = 0 THEN 0
        |  ELSE CAST(cum_cm * 1000000 // cum_r AS BIGINT) END AS nhat_e6
        |FROM run""".stripMargin,


    // q431: shifted-e3 components, cal-split centroids, windowed k-th
    // smallest per label, label-grain coverage census.
    "q431_conformal" ->
      """WITH comps AS (SELECT vec_id AS id, label,
        |  (vec_id % 5 < 4) AS cal, i AS dim,
        |  CAST(round((CAST(embedding[i] AS DOUBLE) + 1.0) * 1000.0)
        |   AS BIGINT) AS x_e3
        | FROM embeddings,
        |  LATERAL (SELECT unnest(generate_series(1, len(embedding)))
        |    AS i) ix),
        |cent AS (SELECT label, dim,
        |  CAST(sum(x_e3) // count(*) AS BIGINT) AS c_e3
        | FROM comps WHERE cal GROUP BY 1, 2),
        |scores AS (SELECT id, comps.label, cal,
        |  CAST(sum((x_e3 - c_e3) * (x_e3 - c_e3)) AS BIGINT) AS s
        | FROM comps JOIN cent USING (label, dim) GROUP BY 1, 2, 3),
        |calr AS (SELECT label, id, s,
        |  row_number() OVER (PARTITION BY label ORDER BY s, id) AS r,
        |  count(*) OVER (PARTITION BY label) AS n_cal
        | FROM scores WHERE cal),
        |qhat AS (SELECT label, s AS qhat_d2, n_cal FROM calr
        | WHERE r = ((n_cal + 1) * 9 + 9) // 10),
        |t AS (SELECT scores.label, s, qhat_d2, n_cal
        | FROM scores LEFT JOIN qhat USING (label) WHERE NOT cal)
        |SELECT label, CAST(max(n_cal) AS BIGINT) AS n_cal,
        | CAST(max(qhat_d2) AS BIGINT) AS qhat_d2,
        | CAST(count(*) AS BIGINT) AS n_test,
        | CAST(sum(CASE WHEN qhat_d2 IS NULL OR s <= qhat_d2
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        | CAST(CAST(sum(CASE WHEN qhat_d2 IS NULL OR s <= qhat_d2
        |   THEN 1 ELSE 0 END) AS HUGEINT) * 1000000 // count(*)
        |  AS BIGINT) AS coverage_e6
        |FROM t GROUP BY 1""".stripMargin,


    // q417: position-polynomial span sums on the cumulative value
    // census; factorial denominators cleared, // everywhere (exactly
    // divisible or toward-zero on the signed ratio numerators).
    "q417_l_moments" ->
      """WITH v0 AS (SELECT
        |  CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
        | FROM orders),
        |m AS (SELECT v, count(*) AS c FROM v0 GROUP BY 1),
        |cu AS (SELECT v, c, sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM m),
        |ag AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |  sum(CAST(v AS HUGEINT) * c) AS a0,
        |  sum(CAST(v AS HUGEINT)
        |   * ((CAST(c AS HUGEINT) * (2 * cum - c - 1)) // 2)) AS a1,
        |  sum(CAST(v AS HUGEINT)
        |   * ((CAST(cum AS HUGEINT) * (cum - 1) * (cum - 2)
        |       - CAST(cum - c AS HUGEINT) * (cum - c - 1)
        |         * (cum - c - 2)) // 3)) AS a2,
        |  sum(CAST(v AS HUGEINT)
        |   * ((CAST(cum AS HUGEINT) * (cum - 1) * (cum - 2) * (cum - 3)
        |       - CAST(cum - c AS HUGEINT) * (cum - c - 1)
        |         * (cum - c - 2) * (cum - c - 3)) // 4)) AS a3
        | FROM cu),
        |lam AS (SELECT n, a0,
        |  2 * a1 - a0 * (n - 1) AS l2n,
        |  6 * a2 - 6 * a1 * (n - 2) + a0 * (n - 1) * (n - 2) AS l3n,
        |  20 * a3 - 30 * a2 * (n - 3)
        |   + 12 * a1 * (n - 2) * (n - 3)
        |   - a0 * (n - 1) * (n - 2) * (n - 3) AS l4n
        | FROM ag)
        |SELECT n,
        | CASE WHEN n > 0 THEN CAST(a0 * 1000000 // n AS BIGINT) END
        |  AS lambda1_e6,
        | CASE WHEN n > 1 THEN CAST(l2n * 1000000
        |  // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) END
        |  AS lambda2_e6,
        | CASE WHEN n > 1 AND a0 > 0 THEN
        |  CAST(l2n * 1000000 // (a0 * (n - 1)) AS BIGINT) END AS t_e6,
        | CASE WHEN n > 2 AND l2n > 0 THEN
        |  CAST(l3n * 1000000 // (l2n * (n - 2)) AS BIGINT) END
        |  AS t3_e6,
        | CASE WHEN n > 3 AND l2n > 0 THEN
        |  CAST(l4n * 1000000 // (l2n * (n - 2) * (n - 3)) AS BIGINT)
        | END AS t4_e6
        |FROM lam""".stripMargin,


    // q408: the KM product recurrence as a recursive CTE over the
    // ranked hour census, RMST accumulating pre-update S per step.
    "q408_rmst" ->
      """WITH RECURSIVE e AS (SELECT user_id, event_type,
        |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
        |v AS (SELECT user_id, min(ts_ms) AS v_ts FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT v.user_id, v.v_ts, min(p.ts_ms) AS p_ts
        | FROM v LEFT JOIN e p ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND p.ts_ms >= v.v_ts
        | GROUP BY 1, 2),
        |endt AS (SELECT max(ts_ms) AS end_ts FROM e),
        |subj AS (SELECT CASE WHEN p_ts IS NOT NULL
        |   THEN (p_ts - v_ts) // 3600000
        |   ELSE (end_ts - v_ts) // 3600000 END AS t,
        |  p_ts IS NOT NULL AS obs
        | FROM fp CROSS JOIN endt),
        |perT AS (SELECT t, count(*) AS n_at,
        |  sum(CASE WHEN obs THEN 1 ELSE 0 END) AS d
        | FROM subj GROUP BY 1),
        |rk AS (SELECT t, n_at, d,
        |  row_number() OVER (ORDER BY t) AS r,
        |  sum(n_at) OVER (ORDER BY t DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        | FROM perT),
        |walk(r, s, rm, lastt) AS (
        | SELECT CAST(0 AS BIGINT), CAST(1000000 AS HUGEINT),
        |  CAST(0 AS HUGEINT), CAST(0 AS BIGINT)
        | UNION ALL
        | SELECT rk.r,
        |  CASE WHEN rk.d > 0 AND rk.t <= 168
        |   THEN w.s * (rk.n_risk - rk.d) // rk.n_risk ELSE w.s END,
        |  w.rm + CASE WHEN w.lastt < 168
        |   THEN w.s * (least(rk.t, 168) - w.lastt)
        |   ELSE CAST(0 AS HUGEINT) END,
        |  CASE WHEN w.lastt < 168 THEN least(rk.t, 168)
        |   ELSE w.lastt END
        | FROM walk w JOIN rk ON rk.r = w.r + 1),
        |lastw AS (SELECT * FROM walk ORDER BY r DESC LIMIT 1),
        |tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n_subjects,
        |  CAST(sum(CASE WHEN t <= 168 THEN d ELSE 0 END) AS BIGINT)
        |   AS n_events_le_tau FROM perT)
        |SELECT CAST(168 AS BIGINT) AS tau, n_subjects,
        | n_events_le_tau, CAST(l.s AS BIGINT) AS s_tau_e6,
        | CAST(l.rm + CASE WHEN l.lastt < 168
        |  THEN l.s * (168 - l.lastt) ELSE 0 END AS BIGINT) AS rmst_e6
        |FROM lastw l, tot""".stripMargin,


    // q392: top-(k+1) by the unique order, threshold = min of the
    // selected set, pinned-double ln terms.
    "q392_hill_tail" ->
      """WITH rev AS (SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |   AS x
        | FROM orders GROUP BY 1),
        |top AS (SELECT x, o_custkey FROM rev WHERE x > 0
        | ORDER BY x DESC, o_custkey LIMIT 101),
        |th AS (SELECT min(x) AS xk1 FROM top),
        |tm AS (SELECT xk1,
        |  CAST(round(ln(CAST(x AS DOUBLE) / xk1) * 1000000.0) AS BIGINT)
        |   AS t
        | FROM top CROSS JOIN th)
        |SELECT CAST(100 AS BIGINT) AS k, xk1,
        | CAST(sum(t) // 100 AS BIGINT) AS hill_e6,
        | CASE WHEN sum(t) // 100 > 0 THEN
        |  CAST(1000000000000 // (sum(t) // 100) AS BIGINT)
        | END AS alpha_e6
        |FROM tm GROUP BY xk1""".stripMargin,


    // q377: the full Lehmer→Poisson(1)→replicate-ratio→order-statistic
    // chain replayed literally (wrap-free BIGINT throughout).
    "q377_poisson_bootstrap" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |  l_orderkey * 131 + l_linenumber * 7 + l_partkey AS rk,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS num,
        |  CAST(round(l_quantity) AS BIGINT) AS den FROM lineitem),
        |e AS (SELECT g, r, num, den,
        |  ((((rk % 2147483647) * 65537 + r + 1) * 48271) % 2147483647)
        |   AS h1
        | FROM b, (SELECT unnest(generate_series(0, 39)) AS r) rr),
        |e2 AS (SELECT g, r, num, den,
        |  (xor(h1, h1 // 65536) * 69621 % 2147483647)
        |   * 1000000000 // 2147483647 AS u FROM e),
        |ww AS (SELECT g, r, num, den,
        |  CAST(CASE WHEN u < 367879441 THEN 0
        |   WHEN u < 735758882 THEN 1
        |   WHEN u < 919698602 THEN 2
        |   WHEN u < 981011843 THEN 3
        |   WHEN u < 996340153 THEN 4
        |   WHEN u < 999405815 THEN 5
        |   ELSE 6 END AS BIGINT) AS w FROM e2),
        |rs AS (SELECT g, r,
        |  sum(CAST(w * num AS HUGEINT)) AS sn,
        |  sum(CAST(w * den AS HUGEINT)) AS sd,
        |  sum(CAST(num AS HUGEINT)) AS pn,
        |  sum(CAST(den AS HUGEINT)) AS pd
        | FROM ww GROUP BY 1, 2),
        |th AS (SELECT *, CASE WHEN sd <= 0 THEN NULL
        |   ELSE CAST(sn * 1000000 // sd AS BIGINT) END AS theta
        | FROM rs),
        |rk2 AS (SELECT *, row_number() OVER
        |   (PARTITION BY g ORDER BY theta ASC NULLS LAST, r) AS rnk,
        |  count(theta) OVER (PARTITION BY g) AS valid FROM th)
        |SELECT g AS l_returnflag,
        | CAST(max(valid) AS BIGINT) AS reps_valid,
        | max(CASE WHEN pd > 0
        |   THEN CAST(pn * 1000000 // pd AS BIGINT) END) AS theta_e6,
        | CASE WHEN max(valid) < 4 THEN NULL
        |  ELSE max(CASE WHEN rnk = 2 THEN theta END) END AS ci_lo_e6,
        | CASE WHEN max(valid) < 4 THEN NULL
        |  ELSE max(CASE WHEN rnk = valid - 1 THEN theta END) END
        |   AS ci_hi_e6
        |FROM rk2 GROUP BY 1""".stripMargin,


    // q366: bucket census → leave-one-out ratios → exact jackknife
    // moments, corrected isqrt for the standard error.
    "q366_jackknife_ratio" ->
      """WITH b AS (SELECT l_returnflag AS g, l_orderkey % 32 AS bk,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS num,
        |  CAST(round(l_quantity) AS BIGINT) AS den FROM lineitem),
        |pb AS (SELECT g, bk, sum(num) AS s_i, sum(den) AS n_i FROM b
        | GROUP BY 1, 2),
        |w AS (SELECT g, bk, s_i, n_i,
        |  sum(s_i) OVER (PARTITION BY g) AS st,
        |  sum(n_i) OVER (PARTITION BY g) AS nt FROM pb),
        |l AS (SELECT *, CASE WHEN nt - n_i <= 0 THEN NULL
        |   ELSE CAST(CAST(st - s_i AS HUGEINT) * 1000000 // (nt - n_i)
        |    AS BIGINT) END AS loo FROM w),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(count(loo) AS BIGINT) AS b_eff,
        |  max(st) AS st, max(nt) AS nt,
        |  CASE WHEN count(loo) = 0 THEN NULL
        |   ELSE CAST(sum(CAST(loo AS HUGEINT)) // count(loo) AS BIGINT)
        |  END AS jk_mean_e6
        | FROM l GROUP BY g),
        |ss AS (SELECT l.g,
        |  sum(CASE WHEN loo IS NULL THEN CAST(0 AS HUGEINT)
        |   ELSE CAST(loo - jk_mean_e6 AS HUGEINT) * (loo - jk_mean_e6)
        |   END) AS ssq
        | FROM l JOIN m ON m.g = l.g GROUP BY 1),
        |f AS (SELECT m.g, n_buckets, b_eff,
        |  CASE WHEN nt <= 0 THEN NULL
        |   ELSE CAST(CAST(st AS HUGEINT) * 1000000 // nt AS BIGINT) END
        |    AS theta_e6,
        |  jk_mean_e6,
        |  CASE WHEN b_eff <= 1 THEN NULL
        |   ELSE CAST(b_eff - 1 AS HUGEINT) * ssq // b_eff END AS var
        | FROM m JOIN ss ON ss.g = m.g),
        |s0c AS (SELECT *,
        |  CAST(floor(sqrt(CAST(var AS DOUBLE))) AS BIGINT) AS s0 FROM f)
        |SELECT g AS l_returnflag, n_buckets, b_eff, theta_e6, jk_mean_e6,
        | CAST(CAST(var AS DECIMAL(38,0)) AS VARCHAR) AS jk_var_e12,
        | CASE WHEN var IS NULL THEN NULL
        |  WHEN CAST(s0 AS HUGEINT) * s0 > var THEN s0 - 1
        |  WHEN (CAST(s0 AS HUGEINT) + 1) * (s0 + 1) <= var THEN s0 + 1
        |  ELSE s0 END AS jk_se_e6
        |FROM s0c""".stripMargin,


    // q360: weighted census + cumulative window, the exact
    // cum·100 ≥ W·p rule per percentile.
    "q360_weighted_quantiles" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |  CAST(round(l_quantity) AS BIGINT) AS v,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS w
        | FROM lineitem),
        |h AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS w FROM b
        | WHERE w > 0 GROUP BY 1, 2),
        |c AS (SELECT g, v,
        |  sum(w) OVER (PARTITION BY g ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(w) OVER (PARTITION BY g) AS tw FROM h)
        |SELECT g AS l_returnflag, CAST(max(tw) AS BIGINT) AS total_weight,
        | min(CASE WHEN CAST(cum AS HUGEINT)*100 >= CAST(tw AS HUGEINT)*25
        |   THEN v END) AS p25,
        | min(CASE WHEN CAST(cum AS HUGEINT)*100 >= CAST(tw AS HUGEINT)*50
        |   THEN v END) AS p50,
        | min(CASE WHEN CAST(cum AS HUGEINT)*100 >= CAST(tw AS HUGEINT)*75
        |   THEN v END) AS p75,
        | min(CASE WHEN CAST(cum AS HUGEINT)*100 >= CAST(tw AS HUGEINT)*95
        |   THEN v END) AS p95
        |FROM c GROUP BY 1""".stripMargin,


    // q310: the full mechanism replay (hash chain + ladder + ranks).
    "q310_poisson_bootstrap" -> q310OracleSql,
  )
}
