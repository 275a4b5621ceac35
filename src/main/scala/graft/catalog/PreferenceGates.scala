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
import graft.Checkpoints.TruncateOps

/** Preference/rl + annotation: bradley–terry, dpo/grpo shapes, agreement coefficients.
  *
  * 23 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object PreferenceGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Cohen's κ: chance-corrected agreement between two deterministic
    // document raters — the quality-score tercile gate vs the length
    // tercile gate. High raw agreement with κ ≈ 0 is the classic
    // "both raters mostly say the same bucket by base rate alone" trap
    // that raw accuracy (q185's confusion census) can't see.
    "q249_cohen_kappa" -> ((s, dir) => {
      val q = TextFunctions.qualityScore(col("text"))
      decStr(operators.Profile.cohenKappa(t(s, dir, "documents"),
        when(q < 40, 0L).when(q < 70, 1L).otherwise(2L),
        when(col("n_chars") < 200, 0L).when(col("n_chars") < 350, 1L)
          .otherwise(2L)))
    }),

    // Bradley–Terry preference-rating aggregation (Hunter 2004 MM) — the
    // preference-data curation op: pairwise "wins" (here: the pricier
    // supplier of each within-order supplier duel, ties to the lower
    // key) fit to per-item strength ratings in e6 fixed point, 3
    // synchronous integer rounds, max-renormalized — the oracle unrolls
    // every round with `//`. PreferenceSpec pins ordering, the 50/50
    // fixpoint, and partition invariance.
    "q333_bradley_terry" -> ((s, dir) =>
      btSupplierDuelsAndRatings(s, dir)._2),

    // Length-bias audit for preference data (the RLHF confound check):
    // pair consecutive docs per source, score with the q16 quality
    // stack, and measure P(longer wins) per length-gap bucket with the
    // exact-integer Wilson lower bound — quality/length ties excluded.
    "q355_length_bias" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"),
          functions.TextFunctions.qualityScore(col("text")).as("q"))
        .withColumn("rn", row_number().over(w))
      val p1 = d.where(col("rn") % 2 === 1)
        .select(col("source"), expr("(rn + 1) div 2").as("pr"),
          col("n_chars").as("len1"), col("q").as("q1"))
      val p2 = d.where(col("rn") % 2 === 0)
        .select(col("source"), expr("(rn + 1) div 2").as("pr"),
          col("n_chars").as("len2"), col("q").as("q2"))
      val pa = p1.join(p2, Seq("source", "pr"))
        .where(col("q1") =!= col("q2") && col("len1") =!= col("len2"))
        .select(least(expr("abs(len1 - len2) div 100"), lit(5L)).as("bk"),
          ((col("len1") > col("len2")) === (col("q1") > col("q2")))
            .as("s"))
      operators.EvalCurves.wilsonLowerBoundE6(pa, col("bk"), col("s"))
        .select(col("item").as("bucket"), col("wins"), col("trials"),
          col("wilson_lb_e6"))
    }),

    // Cronbach's alpha of a 3-item "order-line value scale" (scaled
    // quantity, gross price, net price) per return flag — do the items
    // cohere as one construct; the eval-harness scale-reliability
    // number beside the rater-agreement family.
    "q393_cronbach_alpha" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("__c1", cents(col("l_extendedprice")))
        .withColumn("__c2",
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      operators.Reliability.cronbachAlphaE6(li, Seq("l_returnflag"),
        Seq(round(col("l_quantity")).cast("long") * lit(100L),
          expr("__c1 div 1000"), expr("__c2 div 1000")))
    }),

    // Kendall's W: do the three heuristic "raters" (quantity,
    // discount, tax) rank the same order-lines concordantly —
    // tie-corrected, doubled-midrank exact; the RANKING-agreement
    // sibling of the κ/α label-agreement family.
    "q394_kendalls_w" -> ((s, dir) =>
      decStr(operators.RankStats.kendallsWE6(t(s, dir, "lineitem"),
        Seq(round(col("l_quantity")).cast("long"),
          round(col("l_discount") * 100).cast("long"),
          round(col("l_tax") * 100).cast("long"))))),

    // Fleiss' kappa over the supplier-vote frame: orders with ≥3
    // supplier "raters" keep their 3 lowest-id raters (complete
    // design, pinned), each voting its min return flag on the order —
    // the fixed-m agreement number between Cohen's κ and
    // Krippendorff's α.
    "q409_fleiss_kappa" -> ((s, dir) => {
      val votes = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(min(col("l_returnflag")).as("cat"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey")).orderBy(col("l_suppkey"))
      val top3 = votes.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
      operators.Preference.fleissKappaE6(top3, col("l_orderkey"),
        col("l_suppkey"), col("cat"), raters = 3)
    }),

    // Gwet's AC1 (Gwet 2008) on the q409 supplier-vote frame: the
    // paradox-resistant agreement coefficient — under the skewed
    // return-flag prevalence κ deflates while raters plainly agree;
    // QA dashboards report both. Same censuses, different chance
    // term, exact cross-multiplied ratio.
    "q452_gwet_ac1" -> ((s, dir) => {
      val votes = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(min(col("l_returnflag")).as("cat"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey")).orderBy(col("l_suppkey"))
      val top3 = votes.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
      operators.Preference.gwetAc1E6(top3, col("l_orderkey"),
        col("l_suppkey"), col("cat"), raters = 3)
    }),

    // One-way intraclass correlation ICC(1) (Shrout & Fleiss 1979):
    // orders as targets, their first three line quantities as
    // interchangeable "ratings" — the continuous-score reliability
    // coefficient beside the categorical κ/AC1/α family, ONE exact
    // integer ratio via the cleared-denominator ANOVA identity.
    "q453_icc" -> ((s, dir) =>
      operators.Preference.iccOneWayE6(
        t(s, dir, "lineitem").where(col("l_linenumber") <= 3),
        col("l_orderkey"), round(col("l_quantity")).cast("long"),
        k = 3)),

    // Transcript/dialog structural QA over the events stream read as
    // chat sessions (user_id = session, click/view/signup = user
    // turns, purchase/error = assistant turns): per session the turn
    // counts, first/last role, alternation violations, longest
    // same-role run, and inter-turn gap totals — the validation pass
    // SFT data runs before a conversation enters the training mix.
    "q368_transcript_audit" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        col("event_id"),
        when(col("event_type").isin("click", "view", "signup"), "user")
          .otherwise("assistant").as("role"))
      operators.DialogQa.transcriptAudit(ev, col("user_id"),
        col("ts_ms"), col("role"), col("event_id"))
    }),

    // Pairwise inter-annotator kappa matrix over the q338 vote frame
    // (suppliers "label" their orders with return flags): per supplier
    // pair with ≥ 5 shared orders, exact Cohen's κ on the shared set —
    // the structural drill-down under corpus-level α.
    "q363_pairwise_kappa" -> ((s, dir) =>
      decStr(operators.Preference.pairwiseKappaE6(
        t(s, dir, "lineitem"), col("l_orderkey"), col("l_suppkey"),
        col("l_returnflag"), minShared = 5L))),

    // Murphy decomposition of the Brier score over the q356 calibration
    // frame: reliability / resolution / uncertainty as exact DECIMAL
    // numerators over n·1e12 (bucket means are truncating e6 integers —
    // OUR convention, documented; the classical identity holds up to
    // that truncation). The one-number completion of the q356 table.
    "q362_brier_decomp" -> ((s, dir) => {
      val (du, ratingsFull) = btSupplierDuelsAndRatings(s, dir)
      val ratings = ratingsFull.select(col("item"), col("rating_e6"))
      val cal = du
        .join(ratings.select(col("item").as("a"),
          col("rating_e6").as("ra")), Seq("a"))
        .join(ratings.select(col("item").as("b"),
          col("rating_e6").as("rb")), Seq("b"))
        .select(col("wa"),
          expr("CAST(ra * 1000000 div (ra + rb) AS BIGINT)").as("p"))
        .truncate(true) // duel grain; three aggregates read it
      val bk = cal.groupBy(expr("CAST(p div 100000 AS BIGINT)").as("bk"))
        .agg(count(lit(1)).as("nk"), sum(col("p")).as("sp"),
          sum(col("wa")).as("swa"))
        .select(col("bk"), col("nk"),
          expr("sp div nk").as("pbar"),
          expr("swa * 1000000 div nk").as("obar"))
      val tot = cal.agg(count(lit(1)).as("n"), sum(col("wa")).as("sw"))
        .select(col("n"), expr("sw * 1000000 div n").as("ob"))
        .truncate(true)
      val brier = cal.crossJoin(broadcast(tot))
        .select(expr("CAST(p - wa * 1000000 AS DECIMAL(38,0))" +
          " * (p - wa * 1000000)").as("sq"))
        .agg(sum(col("sq")).as("brier_num"))
      decStr(bk.crossJoin(broadcast(tot))
        .select(col("n"), col("ob"),
          expr("""CAST(nk AS DECIMAL(38,0))
                 | * (pbar - obar) * (pbar - obar)""".stripMargin)
            .as("__rel"),
          expr("""CAST(nk AS DECIMAL(38,0))
                 | * (obar - ob) * (obar - ob)""".stripMargin).as("__res"))
        .groupBy(col("n"), col("ob"))
        .agg(sum(col("__rel")).as("rel_num"), sum(col("__res")).as("res_num"))
        .crossJoin(broadcast(brier))
        .select(col("n"), col("ob").as("obar_e6"),
          col("brier_num"), col("rel_num"), col("res_num"),
          expr("CAST(ob AS DECIMAL(38,0)) * (1000000 - ob)")
            .as("unc_num")))
    }),

    // Reward-model calibration audit: refit q333's BT ratings, predict
    // every duel as p = r_a·1e6 div (r_a + r_b), and compare mean
    // predicted win probability to the actual win share per prediction
    // decile — the calibration table every preference model ships with.
    "q356_bt_calibration" -> ((s, dir) => {
      val (du, ratingsFull) = btSupplierDuelsAndRatings(s, dir)
      val ratings = ratingsFull.select(col("item"), col("rating_e6"))
      du.join(ratings.select(col("item").as("a"),
          col("rating_e6").as("ra")), Seq("a"))
        .join(ratings.select(col("item").as("b"),
          col("rating_e6").as("rb")), Seq("b"))
        .select(col("wa"),
          expr("CAST(ra * 1000000 div (ra + rb) AS BIGINT)").as("p_e6"))
        .groupBy(expr("CAST(p_e6 div 100000 AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("trials"), sum(col("wa")).as("wins_a"),
          sum(col("p_e6")).as("__sp"))
        .select(col("bucket"), col("trials"), col("wins_a"),
          expr("CAST(__sp div trials AS BIGINT)").as("mean_pred_e6"),
          expr("CAST(wins_a * 1000000 div trials AS BIGINT)")
            .as("actual_e6"))
    }),

    // Embedding-truncation recall audit (the MRL/dim-reduction serving
    // question): recall@3 of brute-force cosine over the FIRST 16 of 64
    // dims against the full-dim exact top-3 — the measurement an index
    // owner reads before shipping truncated vectors. Both retrieval
    // stages replay bit-exactly in the oracle (q20's e9-quantized
    // cosine, sliced lists).
    "q334_trunc_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val trEmb = emb.withColumn("embedding", slice(col("embedding"), 1, 16))
      RankEval.recallAtK(
        Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 20),
          "vec_id", "embedding", 3),
        Similarity.bruteForceTopK(trEmb, trEmb.where(col("vec_id") < 20),
          "vec_id", "embedding", 3),
        "qid", "cid")
    }),

    // Group-relative advantage normalization (the GRPO-style reward
    // shaping of group-sampled RL data prep): each user's event rewards
    // normalized against their OWN group's exact mean/sd —
    // (r·n − Σr)·1e6 div isqrt(n·Σr² − (Σr)²), the Neyman cancellation
    // with the corrected integer isqrt, truncating div on the signed
    // numerator (DuckDB `//` ≡ Spark `div`, both toward zero).
    // Degenerate single-row groups emit 0.
    "q335_group_advantage" -> ((s, dir) => {
      val e = ev(s, dir)
        .where(col("value").isNotNull && col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          cents(col("value")).as("reward"))
      operators.Preference.groupAdvantageE6(e, Seq("user_id"),
        col("reward"))
    }),

    // Krippendorff's alpha (nominal) — annotator-agreement reliability,
    // the q249 kappa's many-raters/missing-data generalization: unit =
    // order, "raters" = its line items (12 at sf0.001 → 17 at sf0.1 —
    // the Poisson tail grows with SF, so the bound is the operator max,
    // 36; past it the plan raises loudly by contract), category =
    // return flag. Per-unit 1/(m−1) weights scale exactly by
    // S = lcm(1..35) = 144403552893600, so α lands as a DECIMAL(38,0)
    // ratio plus a truncating-div e6 headline — bit-replayable in SQL.
    "q336_krippendorff" -> ((s, dir) =>
      decStr(operators.Preference.krippendorffAlphaNominal(
        t(s, dir, "lineitem"), col("l_orderkey"), col("l_returnflag"),
        maxRaters = 36))),

    // Krippendorff's alpha, INTERVAL metric — q336's numeric-rating
    // sibling: δ² = squared distance collapses the coincidence matrix
    // into per-unit variance statistics (one pass to unit grain, one
    // one-row reduction). Unit = order, ratings = its line quantities.
    "q339_krippendorff_interval" -> ((s, dir) =>
      decStr(operators.Preference.krippendorffAlphaInterval(
        t(s, dir, "lineitem"), col("l_orderkey"),
        round(col("l_quantity")).cast("long"), maxRaters = 36))),

    // Rao–Kupper Bradley–Terry WITH TIES (θ = 5/4 fixed, 3 MM rounds):
    // the q333 duel frame re-drawn on per-(order,supplier) quantity so
    // equal-quantity duels become genuine ties instead of a coin-flip
    // to one side; per-item denominator sums ride DECIMAL(38,0).
    "q344_bt_ties" -> ((s, dir) => {
      // quantity-duel outcomes ride the shared q333-family pair frame
      // (r15 optimization round — one (order, supplier) self-join per
      // data dir instead of a private rebuild; `oc` is computed there
      // with the identical sign expression)
      val duel = btSupplierDuelsAndRatings(s, dir)._1
        .select(col("a"), col("b"), col("oc"))
      operators.Preference.bradleyTerryTiesE6(duel, col("a"), col("b"),
        col("oc"), thetaE6 = 1250000L, iterations = 3)
    }),

    // One-coin Dawid–Skene noisy-label aggregation (hard-EM / iterative
    // weighted majority): suppliers "annotate" their orders with return
    // flags; two reweighting rounds estimate per-supplier reliability
    // (Laplace-smoothed exact e6) and re-label each order by log-odds
    // weighted vote (integer-rounded weights BEFORE summation — the BM25
    // pinned-double rule; ties score desc, label asc). The oracle
    // replays both rounds term for term.
    "q338_dawid_skene" -> ((s, dir) =>
      operators.Preference.dawidSkeneOneCoinE6(t(s, dir, "lineitem"),
        col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
        iterations = 2)),

    // DPO-pair margin histogram over the q333 duel frame: each duel's
    // fitted-rating margin (winner − loser, e6) bucketed at 0.1-rating
    // width with explicit nonnegative-operand floor division; negative
    // buckets = fitted-model-vs-label disagreements (the label-noise
    // review queue). Pairs stream through broadcast rating joins; the
    // share denominator reduces the HISTOGRAM, not the pairs.
    "q337_dpo_margins" -> ((s, dir) => {
      val (du, ratings) = btSupplierDuelsAndRatings(s, dir)
      val duels = du.select(
        when(col("wa") === 1L, col("a")).otherwise(col("b")).as("w"),
        when(col("wa") === 1L, col("b")).otherwise(col("a")).as("l"))
      operators.Preference.pairMarginHistogramE6(duels, col("w"), col("l"),
        ratings, bucketE6 = 100000L)
    }),

    // k-anonymity generalization LADDER: the DGH walk (Sweeney's
    // full-domain generalization) — five QI granularities from
    // (nation, segment, balance band) up to ∅, audited in one pass
    // each; the published level is the FIRST whose minimum group size
    // clears k (suppression-free full-domain generalization). Balance
    // bands shift +1e5 cents before the integer div so Spark's
    // truncation and DuckDB's floor agree on negative balances.
    "q306_gen_ladder" -> ((s, dir) => {
      val k = 20L
      val c = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("band",
          expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 200000"))
      val levels: Seq[(Long, Seq[Column])] = Seq(
        0L -> Seq(col("c_nationkey"), col("c_mktsegment"), col("band")),
        1L -> Seq(col("c_nationkey"), col("c_mktsegment")),
        2L -> Seq(col("n_regionkey"), col("c_mktsegment")),
        3L -> Seq(col("n_regionkey")),
        4L -> Seq(lit(0L)))
      val audits = levels.map { case (lvl, qi) =>
        c.groupBy(qi: _*).agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_groups"), min(col("sz")).as("min_size"),
            sum(when(col("sz") < k, col("sz")).otherwise(0L))
              .as("suppressed"))
          .withColumn("level", lit(lvl))
          .withColumn("satisfies", col("min_size") >= k)
      }.reduce(_ unionByName _)
      val chosen = audits.where(col("satisfies"))
        .agg(min(col("level")).as("chosen_level"))
      audits.crossJoin(broadcast(chosen))
        .select(col("level"), col("n_groups"), col("min_size"),
          col("suppressed"), col("satisfies"),
          (col("level") === col("chosen_level")).as("chosen"))
    }),

    // Exact unbiased pass@k (Chen et al. 2021 eq. 1) at TASK grain —
    // documents as "samples" grouped by source as the "task", correct
    // = the n_chars quality bar; exact DECIMAL(38,0) consecutive-
    // integer products. The per-task table beside q340's aggregated
    // curve (r15 verdict item 4).
    "q457_pass_at_k" -> ((s, dir) =>
      operators.Preference.passAtKE6(t(s, dir, "documents"),
        col("source"), col("n_chars") >= 200, k = 4)),

    // Online Elo over a bounded deterministic match stream (supplier-
    // vs-part mod-64 "players", win by price-cents parity, total order
    // = the lineitem unique key): the sequential companion of the
    // Bradley–Terry fit — one pow(10, Δ/400) per match on INTEGER
    // rating diffs, zero-sum ⌊x+0.5⌋-pinned updates, replayed by the
    // oracle as a recursive CTE carrying the full rating list.
    "q458_elo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_orderkey") % 199 === 0)
        .select((col("l_suppkey") % 64).as("pa"),
          (col("l_partkey") % 64).as("pb"),
          (cents(col("l_extendedprice")) % 2 === 0).as("aw"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
        .where(col("pa") =!= col("pb"))
      operators.Preference.eloRatings(li, col("pa"), col("pb"), col("aw"),
        Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey")))
    }),

    // GAE(γ=0.9, λ=0.95, H=4) per-step advantages over user event
    // trajectories (reward = event cents, critic baseline = half the
    // reward — a pinned stand-in for a value head): the PPO-side credit
    // assignment beside q335's GRPO group baseline; per-trajectory
    // lead() windows, pinned integer decay chain (r15).
    "q461_gae" -> ((s, dir) =>
      operators.Preference.gaeE6(
        ev(s, dir).withColumn("r", cents(col("value")))
          .withColumn("v", expr("r div 2")),
        col("user_id"), Seq(col("ts_ms"), col("event_id")),
        col("r"), col("v"),
        gammaE6 = 900000L, lambdaE6 = 950000L, horizon = 4)
        .withColumnRenamed("trajectory", "user_id")
        .withColumnRenamed("o0", "ts_ms")
        .withColumnRenamed("o1", "event_id")),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // q249: quality replay + the marginal-product chance correction.
    "q249_cohen_kappa" ->
      s"""WITH r AS (SELECT
         |  CASE WHEN q < 40 THEN 0 WHEN q < 70 THEN 1 ELSE 2 END AS a,
         |  CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 350 THEN 1
         |    ELSE 2 END AS b
         | FROM (SELECT $qualityExprSql AS q, n_chars FROM documents)),
         |c AS (SELECT a, b, count(*) AS cnt FROM r GROUP BY 1, 2),
         |rw AS (SELECT a AS cat, sum(cnt) AS row_n FROM c GROUP BY 1),
         |cl AS (SELECT b AS cat, sum(cnt) AS col_n FROM c GROUP BY 1),
         |pe AS (SELECT coalesce(sum(CAST(row_n AS HUGEINT) * col_n), 0)
         |  AS pe_num FROM rw JOIN cl USING (cat)),
         |t AS (SELECT sum(cnt) AS n,
         |  coalesce(sum(CASE WHEN a = b THEN cnt END), 0) AS n_agree
         | FROM c)
         |SELECT CAST(n AS BIGINT) AS n, CAST(n_agree AS BIGINT) AS n_agree,
         |  CAST(CAST(pe_num AS DECIMAL(38,0)) AS VARCHAR) AS pe_num,
         |  CAST(CAST(CAST(n AS HUGEINT)*n_agree - pe_num AS DECIMAL(38,0))
         |    AS VARCHAR) AS kappa_num,
         |  CAST(CAST(CAST(n AS HUGEINT)*n - pe_num AS DECIMAL(38,0))
         |    AS VARCHAR) AS kappa_den
         |FROM t, pe""".stripMargin,

    // q333: the MM rounds unrolled — per round the pair terms off the
    // previous ratings, the denominator sums, the clamped update, the
    // max renorm; all `//` on non-negative BIGINTs.
    "q333_bradley_terry" -> q333OracleSql,

    "q344_bt_ties" -> q344OracleSql,

    "q355_length_bias" -> q355OracleSql,

    "q356_bt_calibration" -> q356OracleSql,

    "q362_brier_decomp" -> q362OracleSql,

    // q409: complete-design filter (exactly 3 raters kept by rank),
    // the cross-multiplied κ ratio in HUGEINT.
    "q409_fleiss_kappa" ->
      """WITH votes AS (SELECT l_orderkey AS i, l_suppkey AS r,
        |  min(l_returnflag) AS c
        | FROM lineitem GROUP BY 1, 2),
        |rk AS (SELECT i, r, c, row_number() OVER (PARTITION BY i
        |  ORDER BY r) AS rn FROM votes),
        |top3 AS (SELECT i, r, c FROM rk WHERE rn <= 3),
        |sized AS (SELECT i, count(*) AS nr FROM top3 GROUP BY 1),
        |complete AS (SELECT i FROM sized WHERE nr = 3),
        |dropped AS (SELECT CAST(coalesce(sum(CASE WHEN nr <> 3 THEN 1
        |  ELSE 0 END), 0) AS BIGINT) AS n_dropped FROM sized),
        |cells AS (SELECT t.i, t.c, CAST(count(*) AS BIGINT) AS cc
        | FROM top3 t JOIN complete USING (i) GROUP BY 1, 2),
        |ist AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(sq - 3 AS HUGEINT)) AS pbar_num
        | FROM (SELECT i, sum(cc * cc) AS sq FROM cells GROUP BY 1)),
        |mst AS (SELECT sum(CAST(sc AS HUGEINT) * sc) AS pe_num
        | FROM (SELECT c, sum(cc) AS sc FROM cells GROUP BY 1)),
        |f AS (SELECT n, pbar_num, pe_num, n_dropped,
        |  CAST(n AS HUGEINT) * 3 * 2 AS s1,
        |  CAST(n AS HUGEINT) * 3 * n * 3 AS s2
        | FROM ist, mst, dropped)
        |SELECT n AS n_items, CAST(3 AS BIGINT) AS m, n_dropped,
        | CAST(pbar_num * 1000000 // s1 AS BIGINT) AS pbar_e6,
        | CAST(pe_num * 1000000 // s2 AS BIGINT) AS pe_e6,
        | CASE WHEN s2 - pe_num > 0 THEN
        |  CAST((pbar_num * s2 - pe_num * s1) * 1000000
        |   // (s1 * (s2 - pe_num)) AS BIGINT) END AS kappa_e6
        |FROM f""".stripMargin,

    // q452: the q409 censuses with Gwet's chance term — C = P² − Σs²
    // (Σs = P), D = (Q−1)P²; HUGEINT // truncates toward zero like
    // the Spark DECIMAL div.
    "q452_gwet_ac1" ->
      """WITH votes AS (SELECT l_orderkey AS i, l_suppkey AS r,
        |  min(l_returnflag) AS c
        | FROM lineitem GROUP BY 1, 2),
        |rk AS (SELECT i, r, c, row_number() OVER (PARTITION BY i
        |  ORDER BY r) AS rn FROM votes),
        |top3 AS (SELECT i, r, c FROM rk WHERE rn <= 3),
        |sized AS (SELECT i, count(*) AS nr FROM top3 GROUP BY 1),
        |complete AS (SELECT i FROM sized WHERE nr = 3),
        |dropped AS (SELECT CAST(coalesce(sum(CASE WHEN nr <> 3 THEN 1
        |  ELSE 0 END), 0) AS BIGINT) AS n_dropped FROM sized),
        |cells AS (SELECT t.i, t.c, CAST(count(*) AS BIGINT) AS cc
        | FROM top3 t JOIN complete USING (i) GROUP BY 1, 2),
        |ist AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(sq - 3 AS HUGEINT)) AS a
        | FROM (SELECT i, sum(cc * cc) AS sq FROM cells GROUP BY 1)),
        |mst AS (SELECT CAST(count(*) AS BIGINT) AS q_cats,
        |  CAST(sum(sc) AS HUGEINT) AS p,
        |  sum(CAST(sc AS HUGEINT) * sc) AS s2
        | FROM (SELECT c, sum(cc) AS sc FROM cells GROUP BY 1)),
        |f AS (SELECT n, q_cats, a, p * p - s2 AS cterm, n_dropped,
        |  CAST(n AS HUGEINT) * 3 * 2 AS s1,
        |  CAST(q_cats - 1 AS HUGEINT) * p * p AS d
        | FROM ist, mst, dropped)
        |SELECT n AS n_items, CAST(3 AS BIGINT) AS m, q_cats, n_dropped,
        | CAST(a * 1000000 // s1 AS BIGINT) AS pbar_e6,
        | CASE WHEN q_cats >= 2 THEN
        |  CAST(cterm * 1000000 // d AS BIGINT) END AS pe_e6,
        | CASE WHEN q_cats >= 2 AND d - cterm > 0 THEN
        |  CAST((a * d - cterm * s1) * 1000000
        |   // (s1 * (d - cterm)) AS BIGINT) END AS ac1_e6
        |FROM f""".stripMargin,

    // q453: the cleared-denominator ANOVA identity in HUGEINT; the
    // possibly-negative numerator truncates toward zero in both
    // engines.
    "q453_icc" ->
      """WITH base AS (SELECT l_orderkey AS i,
        |  CAST(round(l_quantity) AS BIGINT) AS x
        | FROM lineitem WHERE l_linenumber <= 3),
        |per AS (SELECT i, CAST(count(*) AS BIGINT) AS nr,
        |  CAST(sum(x) AS BIGINT) AS t,
        |  sum(CAST(x AS HUGEINT) * x) AS xx FROM base GROUP BY 1),
        |dropped AS (SELECT CAST(coalesce(sum(CASE WHEN nr <> 3 THEN 1
        |  ELSE 0 END), 0) AS BIGINT) AS n_dropped FROM per),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(t) AS HUGEINT) AS g,
        |  sum(CAST(t AS HUGEINT) * t) AS tt,
        |  sum(xx) AS sxx FROM per WHERE nr = 3),
        |f AS (SELECT n, n * tt - g * g AS u, 3 * sxx - tt AS v,
        |  n_dropped FROM agg, dropped)
        |SELECT n AS n_targets, CAST(3 AS BIGINT) AS k, n_dropped,
        | CASE WHEN 2 * (u + (n - 1) * v) > 0 THEN
        |  CAST((u * 2 - v * (n - 1)) * 1000000
        |   // (2 * (u + (n - 1) * v)) AS BIGINT) END AS icc_e6
        |FROM f""".stripMargin,

    // q394: rank2 maps per rater as cumulative censuses, the
    // tie-invariant S2 identity, tie terms t³−t in HUGEINT.
    "q394_kendalls_w" ->
      """WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS r0,
        |  CAST(round(l_discount * 100) AS BIGINT) AS r1,
        |  CAST(round(l_tax * 100) AS BIGINT) AS r2
        | FROM lineitem),
        |m0 AS (SELECT r0 AS v, count(*) AS c FROM b GROUP BY 1),
        |m1 AS (SELECT r1 AS v, count(*) AS c FROM b GROUP BY 1),
        |m2 AS (SELECT r2 AS v, count(*) AS c FROM b GROUP BY 1),
        |k0 AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |  + c + 1 AS rk FROM m0),
        |k1 AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |  + c + 1 AS rk FROM m1),
        |k2 AS (SELECT v, 2 * (sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |  + c + 1 AS rk FROM m2),
        |j AS (SELECT k0.rk + k1.rk + k2.rk AS rs
        | FROM b JOIN k0 ON k0.v = b.r0 JOIN k1 ON k1.v = b.r1
        |  JOIN k2 ON k2.v = b.r2),
        |core AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(rs AS HUGEINT) * rs) AS sr2 FROM j),
        |t0 AS (SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS t FROM m0),
        |t1 AS (SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS t FROM m1),
        |t2 AS (SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS t FROM m2),
        |tt AS (SELECT t0.t + t1.t + t2.t AS sum_t FROM t0, t1, t2),
        |fin AS (SELECT n,
        |  sr2 - CAST(n AS HUGEINT) * 9 * (n + 1) * (n + 1) AS s2,
        |  sum_t,
        |  9 * (CAST(n AS HUGEINT) * n * n - n) - 3 * sum_t AS den
        | FROM core, tt)
        |SELECT n, CAST(3 AS BIGINT) AS m,
        | CAST(CAST(s2 AS DECIMAL(38,0)) AS VARCHAR) AS s2,
        | CAST(CAST(sum_t AS DECIMAL(38,0)) AS VARCHAR) AS sum_t,
        | CASE WHEN den > 0 THEN
        |  CAST(3 * s2 * 1000000 // den AS BIGINT) END AS w_e6,
        | CASE WHEN den > 0 THEN
        |  CAST(3 * (n - 1) * (3 * s2 * 1000000 // den) AS BIGINT)
        | END AS chi2_e6
        |FROM fin""".stripMargin,

    // q393: cleared-denominator variance numerators in HUGEINT; the
    // two pinned truncating divisions of the alpha identity.
    "q393_cronbach_alpha" ->
      """WITH b AS (SELECT l_returnflag,
        |  CAST(round(l_quantity) AS BIGINT) * 100 AS x0,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) // 1000 AS x1,
        |  CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |   AS BIGINT) // 1000 AS x2
        | FROM lineitem),
        |tt AS (SELECT l_returnflag, x0, x1, x2, x0 + x1 + x2 AS t
        | FROM b),
        |ss AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x0) AS BIGINT) AS s0,
        |  sum(CAST(x0 AS HUGEINT) * x0) AS q0,
        |  CAST(sum(x1) AS BIGINT) AS s1,
        |  sum(CAST(x1 AS HUGEINT) * x1) AS q1,
        |  CAST(sum(x2) AS BIGINT) AS s2,
        |  sum(CAST(x2 AS HUGEINT) * x2) AS q2,
        |  CAST(sum(t) AS BIGINT) AS stt,
        |  sum(CAST(t AS HUGEINT) * t) AS qtt
        | FROM tt GROUP BY 1),
        |vv AS (SELECT *, n * qtt - CAST(stt AS HUGEINT) * stt AS vt
        | FROM ss),
        |rr AS (SELECT l_returnflag, n,
        |  CASE WHEN vt > 0 THEN CAST(
        |   ((n * q0 - CAST(s0 AS HUGEINT) * s0)
        |    + (n * q1 - CAST(s1 AS HUGEINT) * s1)
        |    + (n * q2 - CAST(s2 AS HUGEINT) * s2)) * 1000000 // vt
        |   AS BIGINT) END AS ratio_e6
        | FROM vv)
        |SELECT l_returnflag, n, CAST(3 AS BIGINT) AS k, ratio_e6,
        | CASE WHEN ratio_e6 IS NOT NULL THEN
        |  CAST(3 * (1000000 - ratio_e6) // 2 AS BIGINT)
        | END AS alpha_e6
        |FROM rr""".stripMargin,

    // q368: session-partitioned windows (lag + running sum for the
    // gaps-and-islands run ids), then one session-grain census.
    "q368_transcript_audit" ->
      """WITH b AS (SELECT user_id AS session, epoch_ms(ts) AS ts_ms,
        |  event_id AS tie,
        |  CASE WHEN event_type IN ('click', 'view', 'signup')
        |   THEN 'user' ELSE 'assistant' END AS role
        | FROM events),
        |t AS (SELECT *, lag(role) OVER w AS prev_role,
        |  ts_ms - lag(ts_ms) OVER w AS gap_ms
        | FROM b WINDOW w AS (PARTITION BY session ORDER BY ts_ms, tie)),
        |r AS (SELECT *, sum(CASE WHEN prev_role IS NULL
        |    OR prev_role <> role THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY session ORDER BY ts_ms, tie
        |    ROWS UNBOUNDED PRECEDING) AS run_id FROM t),
        |rl AS (SELECT session, CAST(max(cnt) AS BIGINT) AS max_role_run
        | FROM (SELECT session, run_id, count(*) AS cnt FROM r
        |       GROUP BY 1, 2) GROUP BY 1),
        |ps AS (SELECT session, CAST(count(*) AS BIGINT) AS n_turns,
        |  CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
        |  first(role ORDER BY ts_ms, tie) AS first_role,
        |  last(role ORDER BY ts_ms, tie) AS last_role,
        |  CAST(sum(CASE WHEN prev_role = role THEN 1 ELSE 0 END)
        |    AS BIGINT) AS alternation_violations,
        |  max(gap_ms) AS max_gap_ms,
        |  CAST(coalesce(sum(gap_ms), 0) AS BIGINT) AS total_gap_ms
        | FROM t GROUP BY 1)
        |SELECT ps.*, rl.max_role_run FROM ps
        | JOIN rl USING (session)""".stripMargin,

    // q363: the shared-set pair expansion, per-pair label-histogram
    // cross mass, and the exact κ ratio.
    "q363_pairwise_kappa" ->
      """WITH v AS (SELECT l_orderkey AS i, l_suppkey AS a,
        |  min(l_returnflag) AS l
        | FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT x.a AS a1, y.a AS a2, x.l AS l1, y.l AS l2
        | FROM v x JOIN v y ON x.i = y.i AND x.a < y.a),
        |b AS (SELECT a1, a2, count(*) AS n_shared,
        |  CAST(sum(CASE WHEN l1 = l2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_agree
        | FROM p GROUP BY 1, 2 HAVING count(*) >= 5),
        |c1 AS (SELECT a1, a2, l1 AS l, count(*) AS c1 FROM p
        | GROUP BY 1, 2, 3),
        |c2 AS (SELECT a1, a2, l2 AS l, count(*) AS c2 FROM p
        | GROUP BY 1, 2, 3),
        |pe AS (SELECT a1, a2,
        |  sum(CAST(c1 AS HUGEINT) * c2) AS pe_num
        | FROM c1 JOIN c2 USING (a1, a2, l) GROUP BY 1, 2)
        |SELECT b.a1, b.a2, n_shared, n_agree,
        | CAST(CAST(pe_num AS DECIMAL(38,0)) AS VARCHAR) AS pe_num,
        | CAST(CASE WHEN CAST(n_shared AS HUGEINT) * n_shared = pe_num
        |   THEN NULL
        |  ELSE (CAST(n_agree AS HUGEINT) * n_shared - pe_num) * 1000000
        |   // (CAST(n_shared AS HUGEINT) * n_shared - pe_num) END
        |  AS BIGINT) AS kappa_e6
        |FROM b JOIN pe ON pe.a1 = b.a1 AND pe.a2 = b.a2""".stripMargin,

    // q334: the q144 recall audit with the candidate stage replayed on
    // the sliced (16-dim) lists — same e9-quantized cosine both sides.
    "q334_trunc_recall" ->
      s"""WITH gt AS (SELECT * FROM (${bruteCosineSqlFor("embedding")})),
         |cand AS (SELECT * FROM (${bruteCosineSqlFor("embedding[1:16]")})),
         |j AS (SELECT g.qid,
         |  CASE WHEN c.cid IS NOT NULL THEN 1 ELSE 0 END AS hit
         | FROM gt g LEFT JOIN cand c ON c.qid = g.qid AND c.cid = g.cid)
         |SELECT qid, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(hit) AS BIGINT) AS hits,
         |  CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM j GROUP BY 1""".stripMargin,

    // q335: the same window census, corrected isqrt (squares widened to
    // HUGEINT, mirroring the Spark side's DECIMAL(38,0) — near-Long.Max
    // vn must not overflow either engine), and signed truncating
    // division (// ≡ div toward zero on both engines).
    "q335_group_advantage" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CAST(round(value*100) AS BIGINT) AS reward
        | FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT user_id, event_id, reward,
        |  count(*) OVER w AS n,
        |  CAST(sum(reward) OVER w AS BIGINT) AS s,
        |  CAST(sum(reward*reward) OVER w AS BIGINT) AS ss
        | FROM e WINDOW w AS (PARTITION BY user_id)),
        |v AS (SELECT *, n*ss - s*s AS vn,
        |  CAST(floor(sqrt(CAST(n*ss - s*s AS DOUBLE))) AS BIGINT) AS s0
        | FROM g),
        |c AS (SELECT *,
        |  CASE WHEN CAST(s0 AS HUGEINT)*s0 > vn THEN s0 - 1
        |  WHEN (CAST(s0 AS HUGEINT)+1)*(s0+1) <= vn THEN s0 + 1
        |  ELSE s0 END AS sd
        | FROM v)
        |SELECT user_id, event_id, reward,
        | CAST(CASE WHEN n < 2 OR sd <= 0 THEN 0
        |  ELSE (reward*n - s) * 1000000 // sd END AS BIGINT) AS adv_e6
        |FROM c""".stripMargin,

    // q339: the per-unit variance identity, same S scaling as q336;
    // products widened to HUGEINT before the S multiply.
    "q339_krippendorff_interval" ->
      """WITH v AS (SELECT l_orderkey AS u,
        |  CAST(round(l_quantity) AS BIGINT) AS x FROM lineitem),
        |pu AS (SELECT u, count(*) AS m, CAST(sum(x) AS BIGINT) AS s,
        |  CAST(sum(x*x) AS BIGINT) AS ss
        | FROM v GROUP BY 1 HAVING count(*) >= 2),
        |ag AS (SELECT CAST(sum(m) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_units,
        |  sum(CAST(2*(m*ss - s*s) AS HUGEINT)
        |    * (144403552893600 // (m - 1))) AS a2,
        |  sum(CAST(s AS HUGEINT)) AS sums,
        |  sum(CAST(ss AS HUGEINT)) AS sstot
        | FROM pu)
        |SELECT n, n_units,
        | CAST(CAST(144403552893600
        |   * (2*(CAST(n AS HUGEINT)*sstot - sums*sums))
        |   - (n-1)*a2 AS DECIMAL(38,0)) AS VARCHAR) AS alpha_num,
        | CAST(CAST(144403552893600
        |   * (2*(CAST(n AS HUGEINT)*sstot - sums*sums))
        |   AS DECIMAL(38,0)) AS VARCHAR) AS alpha_den,
        | CAST(CASE WHEN 144403552893600
        |    * (2*(CAST(n AS HUGEINT)*sstot - sums*sums)) = 0 THEN NULL
        |  ELSE (144403552893600
        |    * (2*(CAST(n AS HUGEINT)*sstot - sums*sums)) - (n-1)*a2)
        |    * 1000000
        |   // (144403552893600
        |    * (2*(CAST(n AS HUGEINT)*sstot - sums*sums))) END
        |  AS BIGINT) AS alpha_e6
        |FROM ag""".stripMargin,

    // q338: both hard-EM rounds unrolled — majority seed, per-annotator
    // smoothed accuracy, the pinned ln log-odds weight (same operation
    // order as the Spark expr), weighted-vote argmax per round.
    "q338_dawid_skene" ->
      """WITH v AS (SELECT l_orderkey AS i, l_suppkey AS a,
        |  l_returnflag AS l FROM lineitem),
        |kk AS (SELECT count(DISTINCT l) AS k FROM v),
        |c0 AS (SELECT i, l, count(*) AS n FROM v GROUP BY 1, 2),
        |r0 AS (SELECT i, l AS cl FROM (SELECT i, l,
        |   row_number() OVER (PARTITION BY i ORDER BY n DESC, l) AS rn
        |  FROM c0) WHERE rn = 1),
        |a1 AS (SELECT a, count(*) AS na,
        |  sum(CASE WHEN v.l = r.cl THEN 1 ELSE 0 END) AS ma
        | FROM v JOIN r0 r USING (i) GROUP BY 1),
        |w1 AS (SELECT a,
        |  CAST(round(ln(CAST((ma + 1) * 1000000 // (na + 2) AS DOUBLE)
        |    / 1000000.0 * (k - 1)
        |    / (1.0 - CAST((ma + 1) * 1000000 // (na + 2) AS DOUBLE)
        |      / 1000000.0)) * 1000000.0) AS BIGINT) AS w
        | FROM a1 CROSS JOIN kk),
        |s1 AS (SELECT i, l, CAST(sum(w) AS BIGINT) AS s
        | FROM v JOIN w1 USING (a) GROUP BY 1, 2),
        |r1 AS (SELECT i, l AS cl FROM (SELECT i, l,
        |   row_number() OVER (PARTITION BY i ORDER BY s DESC, l) AS rn
        |  FROM s1) WHERE rn = 1),
        |a2 AS (SELECT a, count(*) AS na,
        |  sum(CASE WHEN v.l = r.cl THEN 1 ELSE 0 END) AS ma
        | FROM v JOIN r1 r USING (i) GROUP BY 1),
        |w2 AS (SELECT a,
        |  CAST(round(ln(CAST((ma + 1) * 1000000 // (na + 2) AS DOUBLE)
        |    / 1000000.0 * (k - 1)
        |    / (1.0 - CAST((ma + 1) * 1000000 // (na + 2) AS DOUBLE)
        |      / 1000000.0)) * 1000000.0) AS BIGINT) AS w
        | FROM a2 CROSS JOIN kk),
        |s2 AS (SELECT i, l, CAST(sum(w) AS BIGINT) AS s
        | FROM v JOIN w2 USING (a) GROUP BY 1, 2),
        |r2 AS (SELECT i, l AS cl FROM (SELECT i, l,
        |   row_number() OVER (PARTITION BY i ORDER BY s DESC, l) AS rn
        |  FROM s2) WHERE rn = 1),
        |nv AS (SELECT i, CAST(count(*) AS BIGINT) AS n_votes
        | FROM v GROUP BY 1)
        |SELECT r2.i AS item, r2.cl AS label, nv.n_votes
        |FROM r2 JOIN nv USING (i)""".stripMargin,

    // q337: the q333 fit replayed as a CTE, margins bucketed with the
    // same nonnegative-operand floor division (// ≡ div toward zero).
    "q337_dpo_margins" ->
      s"""WITH bt AS ($q333OracleSql),
         |os2 AS (SELECT l_orderkey AS o, l_suppkey AS s,
         |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         |   AS c
         | FROM lineitem GROUP BY 1, 2),
         |duel2 AS (SELECT
         |  CASE WHEN y.c > x.c THEN y.s ELSE x.s END AS w,
         |  CASE WHEN y.c > x.c THEN x.s ELSE y.s END AS l
         | FROM os2 x JOIN os2 y ON x.o = y.o AND x.s < y.s),
         |j AS (SELECT bw.rating_e6 - bl.rating_e6 AS m
         | FROM duel2 d JOIN bt bw ON bw.item = d.w
         |  JOIN bt bl ON bl.item = d.l),
         |h AS (SELECT CASE WHEN m >= 0 THEN m // 100000
         |   ELSE -((-m + 99999) // 100000) END AS margin_bucket,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         | FROM j GROUP BY 1),
         |tot AS (SELECT sum(n_pairs) AS t FROM h)
         |SELECT margin_bucket, n_pairs,
         | CAST(n_pairs * 1000000 // t AS BIGINT) AS share_e6
         |FROM h CROSS JOIN tot""".stripMargin,

    // q336: the lcm-scaled coincidence identity replayed in HUGEINT;
    // S = lcm(1..35) = 144403552893600 divides every (m−1) for m ≤ 36.
    "q336_krippendorff" ->
      """WITH cell AS (SELECT l_orderkey AS u, l_returnflag AS c,
        |  count(*) AS o FROM lineitem GROUP BY 1, 2),
        |pu AS (SELECT u, sum(o) AS m, sum(o*(o-1)) AS dd
        | FROM cell GROUP BY 1 HAVING sum(o) >= 2),
        |ua AS (SELECT CAST(sum(m) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_units,
        |  sum(CAST(dd * (144403552893600 // (m - 1)) AS HUGEINT)) AS a
        | FROM pu),
        |nc AS (SELECT c, sum(o) AS ncnt
        | FROM cell JOIN pu USING (u) GROUP BY 1),
        |ca AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
        |  sum(CAST(ncnt AS HUGEINT) * ncnt) AS n2 FROM nc)
        |SELECT n, n_units, n_categories,
        | CAST(CAST((n - 1) * a + 144403552893600 * (n - n2) AS DECIMAL(38,0))
        |   AS VARCHAR) AS alpha_num,
        | CAST(CAST(144403552893600 * (CAST(n AS HUGEINT) * n - n2) AS DECIMAL(38,0))
        |   AS VARCHAR) AS alpha_den,
        | CAST(CASE WHEN 144403552893600 * (CAST(n AS HUGEINT) * n - n2) = 0
        |  THEN NULL
        |  ELSE (((n - 1) * a + 144403552893600 * (n - n2)) * 1000000)
        |    // (144403552893600 * (CAST(n AS HUGEINT) * n - n2)) END
        |  AS BIGINT) AS alpha_e6
        |FROM ua CROSS JOIN ca""".stripMargin,

    // q306: five grouping granularities, first-satisfying pick.
    "q306_gen_ladder" ->
      """WITH c AS (
        | SELECT c_nationkey, c_mktsegment, n_regionkey,
        |  (CAST(round(c_acctbal*100) AS BIGINT) + 100000) // 200000
        |    AS band
        | FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |l0 AS (SELECT count(*) AS sz FROM c
        |  GROUP BY c_nationkey, c_mktsegment, band),
        |l1 AS (SELECT count(*) AS sz FROM c
        |  GROUP BY c_nationkey, c_mktsegment),
        |l2 AS (SELECT count(*) AS sz FROM c
        |  GROUP BY n_regionkey, c_mktsegment),
        |l3 AS (SELECT count(*) AS sz FROM c GROUP BY n_regionkey),
        |l4 AS (SELECT count(*) AS sz FROM c),
        |a AS (
        | SELECT 0 AS level, count(*) AS n_groups, min(sz) AS min_size,
        |  sum(CASE WHEN sz < 20 THEN sz ELSE 0 END) AS suppressed FROM l0
        | UNION ALL SELECT 1, count(*), min(sz),
        |  sum(CASE WHEN sz < 20 THEN sz ELSE 0 END) FROM l1
        | UNION ALL SELECT 2, count(*), min(sz),
        |  sum(CASE WHEN sz < 20 THEN sz ELSE 0 END) FROM l2
        | UNION ALL SELECT 3, count(*), min(sz),
        |  sum(CASE WHEN sz < 20 THEN sz ELSE 0 END) FROM l3
        | UNION ALL SELECT 4, count(*), min(sz),
        |  sum(CASE WHEN sz < 20 THEN sz ELSE 0 END) FROM l4),
        |s AS (SELECT *, min_size >= 20 AS satisfies FROM a),
        |ch AS (SELECT min(level) AS chosen_level FROM s WHERE satisfies)
        |SELECT CAST(level AS BIGINT) AS level,
        | CAST(n_groups AS BIGINT) AS n_groups,
        | CAST(min_size AS BIGINT) AS min_size,
        | CAST(suppressed AS BIGINT) AS suppressed, satisfies,
        | (level = ch.chosen_level) AS chosen
        |FROM s CROSS JOIN ch""".stripMargin,

    // q457: the k=4 products as HUGEINT consecutive integers — a zero
    // term lands in the numerator exactly when n−c < k, so no CASE; //
    // truncates toward zero like the Spark DECIMAL div (operands ≥ 0).
    "q457_pass_at_k" ->
      """WITH t AS (SELECT source AS task, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS c
        | FROM documents GROUP BY 1),
        |f AS (SELECT task, n, c FROM t WHERE n >= 4)
        |SELECT task, n, c,
        | CAST(1000000 AS BIGINT) - CAST((CAST(1000000 AS HUGEINT)
        |   * ((n-c)::HUGEINT * (n-c-1) * (n-c-2) * (n-c-3)))
        |  // (n::HUGEINT * (n-1) * (n-2) * (n-3)) AS BIGINT) AS pass_e6
        |FROM f""".stripMargin,

    // q458: the sequential fold replayed as a recursive CTE carrying
    // the full (player, rating, n_matches) list; the per-step expected
    // score pins the identical ⌊1e6/(1+10^(Δ/400)) + 0.5⌋ expression
    // the Scala fold computes (q374 pow-parity precedent), and the
    // K·(1e6−E)//1e6 delta truncates toward zero in both engines.
    "q458_elo" ->
      """WITH RECURSIVE m AS (
        | SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber,
        |   l_partkey, l_suppkey) AS i,
        |  l_suppkey % 64 AS pa, l_partkey % 64 AS pb,
        |  (CAST(round(l_extendedprice * 100) AS BIGINT) % 2) = 0 AS aw
        | FROM lineitem
        | WHERE l_orderkey % 199 = 0 AND l_suppkey % 64 <> l_partkey % 64),
        |players AS (SELECT DISTINCT p FROM
        | (SELECT pa AS p FROM m UNION ALL SELECT pb FROM m)),
        |init AS (SELECT list(struct_pack(p := p,
        |  r := CAST(1500 AS BIGINT), nm := CAST(0 AS BIGINT))
        |  ORDER BY p) AS ps FROM players),
        |walk(i, ps) AS (
        | SELECT CAST(0 AS BIGINT) AS i, ps FROM init
        | UNION ALL
        | SELECT w.i + 1,
        |  list_transform(w.ps, x -> CASE
        |    WHEN x.p = s.mw THEN struct_pack(p := x.p, r := x.r + s.d,
        |      nm := x.nm + 1)
        |    WHEN x.p = s.ml THEN struct_pack(p := x.p, r := x.r - s.d,
        |      nm := x.nm + 1)
        |    ELSE x END)
        | FROM walk w JOIN m ON m.i = w.i + 1, LATERAL (
        |   SELECT mw, ml,
        |    CAST(32 * (1000000 - CAST(floor(1000000.0
        |      / (1.0 + pow(10.0, (rl - rw) / 400.0)) + 0.5) AS BIGINT))
        |     // 1000000 AS BIGINT) AS d
        |   FROM (SELECT
        |     CASE WHEN m.aw THEN m.pa ELSE m.pb END AS mw,
        |     CASE WHEN m.aw THEN m.pb ELSE m.pa END AS ml,
        |     list_filter(w.ps, x -> x.p = CASE WHEN m.aw THEN m.pa
        |       ELSE m.pb END)[1].r AS rw,
        |     list_filter(w.ps, x -> x.p = CASE WHEN m.aw THEN m.pb
        |       ELSE m.pa END)[1].r AS rl)) s),
        |last AS (SELECT ps FROM walk ORDER BY i DESC LIMIT 1),
        |flat AS (SELECT unnest(ps) AS u FROM last)
        |SELECT u.p AS player, u.r AS rating, u.nm AS n_matches
        |FROM flat""".stripMargin,

    // q461: gl = 900000·950000 // 1e6 = 855000; the decay chain
    // c_k = c_{k−1}·gl // 1e6 unrolls to the literals below; every //
    // truncates toward zero like the Spark div (signed-safe).
    "q461_gae" ->
      """WITH s AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS r FROM events),
        |b AS (SELECT user_id, ts_ms, event_id, r, r // 2 AS v FROM s),
        |d AS (SELECT user_id, ts_ms, event_id, r, v,
        |  r + (900000 * COALESCE(lead(v) OVER w, 0)) // 1000000 - v
        |   AS delta
        | FROM b
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |l AS (SELECT user_id, ts_ms, event_id, r, v, delta,
        |  COALESCE(lead(delta, 1) OVER w, 0) AS d1,
        |  COALESCE(lead(delta, 2) OVER w, 0) AS d2,
        |  COALESCE(lead(delta, 3) OVER w, 0) AS d3,
        |  COALESCE(lead(delta, 4) OVER w, 0) AS d4
        | FROM d
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
        |SELECT user_id, ts_ms, event_id, r AS reward, v AS value, delta,
        | (1000000 * delta) // 1000000 + (855000 * d1) // 1000000
        |  + (731025 * d2) // 1000000 + (625026 * d3) // 1000000
        |  + (534397 * d4) // 1000000 AS advantage
        |FROM l""".stripMargin,
  )
}
