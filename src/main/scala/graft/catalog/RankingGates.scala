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

/** Ranking/classifier eval: auc, calibration, gains, ndcg-shape metrics, pass@k, slice finder.
  *
  * 16 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object RankingGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Retrieval: BM25 relevance ranking over the corpus for a fixed term
    // set — one tokenize pass feeds dl and tf, df/global stats broadcast
    // back, per-term contributions integer-scaled BEFORE the long sum
    // (never hash-gate a raw double sum), rank total-ordered.
    "q72_bm25" -> ((s, dir) =>
      operators.TextRank.bm25(t(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "window", "spark"))),

    // Calibration / reliability table (the AUC companion): per score
    // decade, n and positives with the exact ppm rate — monotone rates =
    // well-ordered scores; one counting aggregation.
    "q141_calibration" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(TextFunctions.qualityScore(col("text")).as("q"),
          when(col("lang") === "en", 1L).otherwise(0L).as("p"))
        .groupBy(expr("q div 10").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("n_pos"))
        .withColumn("rate_ppm", expr("n_pos * 1000000 div n"))),

    // Worst-slice finder (slice-finder lite, 1-D slices the way real
    // slice finders start): every lang:X and source:Y slice with n ≥ 5,
    // the ppm deviation of its pass rate from the global — top-10 by
    // (deviation desc, dim, slice); Expand-style union of the two
    // groupings over ONE scored scan, plus a broadcast global row.
    "q142_slice_finder" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("lang"), col("source"),
          when(TextFunctions.qualityScore(col("text")) >= 75L, 1L)
            .otherwise(0L).as("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def dim(name: String, c: Column) = scored
        .groupBy(c.as("slice")).agg(count(lit(1)).as("n"),
          sum(col("p")).as("n_pass"))
        .withColumn("dim", lit(name))
      val slices = dim("lang", col("lang"))
        .unionByName(dim("source", col("source")))
        .where(col("n") >= 5L)
        .withColumn("rate_ppm", expr("n_pass * 1000000 div n"))
      val global = scored.agg(count(lit(1)).as("gn"), sum(col("p")).as("gp"))
        .withColumn("g_rate_ppm", expr("gp * 1000000 div gn"))
        .select(col("g_rate_ppm"))
      slices.crossJoin(broadcast(global))
        .withColumn("dev_ppm", abs(col("rate_ppm") - col("g_rate_ppm")))
        .orderBy(col("dev_ppm").desc, col("dim"), col("slice"))
        .limit(10)
        .select(col("dim"), col("slice"), col("n"), col("n_pass"),
          col("rate_ppm"), col("g_rate_ppm"), col("dev_ppm"))
    }),

    // EXACT ROC AUC with midrank ties as an integer ratio — quality
    // score predicting lang=en; histogram cells + one cumulative window,
    // no raw-data sort, no float ranks.
    "q140_auc" -> ((s, dir) =>
      operators.Profile.exactAuc(
        t(s, dir, "documents").select(
          TextFunctions.qualityScore(col("text")).as("q"),
          (col("lang") === "en").as("is_en")),
        col("q"), col("is_en"))),

    // Grouped top-k (A8 at group granularity): rank()<=k over a window
    // triggers Catalyst's WindowGroupLimit rewrite — each map task keeps
    // only its local top-k per group BEFORE the shuffle, so the exchange
    // carries O(groups·k) per partition instead of the full table (the
    // same partial-top-k shape KmvSketch's spec pins). Total order via
    // (cents DESC, orderkey ASC).
    "q98_grouped_topk" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("cents").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
    }),

    // Rank-biased overlap (p=9/10, depth 3) of the IVF ranking vs exact
    // top-3 — the ORDER-sensitive companion to q144's recall audit,
    // decided with literal integer tail weights shared with the oracle.
    "q184_rbo" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.where(col("vec_id") < 20)
      RankEval.rboMinE6(
        Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3),
        Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
          k = 3, nLists = 16, nProbe = 4),
        "qid", "cid", "rank", k = 3)
    }),

    // Multinomial NB label audit: train on even doc_ids, score odd,
    // per-term e6-rounded log-likelihoods summed as integers (the q179
    // discipline), broadcast vocab×lang model — held-out confusion.
    "q185_nb_confusion" -> ((s, dir) =>
      operators.NaiveBayes.heldOutConfusion(
        t(s, dir, "documents"), "doc_id", "text", "lang")),

    // Leave-last-out recommender evaluation, end to end and
    // leakage-free: every user's LAST interaction is held out, item-item
    // cosine trains on the remainder only (q143 machinery), candidates
    // score as Σ sim(history, cand) with history excluded, hit-rate@3
    // decided in integers. The standard offline eval a recommender ships
    // with — and the leakage trap (training on the held-out event) is
    // exactly what the train/test split here refuses.
    "q206_leave_last_out" -> ((s, dir) => {
      val ev0 = ev(s, dir).select(col("user_id").cast("string").as("u"),
        concat(lit("C"), pmod(get_json_object(col("props"), "$.k")
          .cast("long"), lit(20)).cast("string")).as("item"),
        col("ts_ms"), col("event_id"))
      val wLast = org.apache.spark.sql.expressions.Window
        .partitionBy(col("u"))
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      val marked = ev0.withColumn("rn", row_number().over(wLast))
      val test = marked.where(col("rn") === 1)
        .select(col("u"), col("item").as("held"))
      val train = marked.where(col("rn") > 1).select(col("u"), col("item"))
      val sims = operators.ItemCF.itemSimilarity(train, col("u"),
        col("item"), minCooc = 5L)
      val simBoth = sims.select(col("item_a").as("h"),
          col("item_b").as("cand"), col("cos2_e12"))
        .unionByName(sims.select(col("item_b").as("h"),
          col("item_a").as("cand"), col("cos2_e12")))
      val hist = train.distinct()
      val scored = hist.withColumnRenamed("item", "h")
        .join(simBoth, "h")
        .join(hist.withColumnRenamed("item", "cand")
          .withColumn("own", lit(1)), Seq("u", "cand"), "left")
        .where(col("own").isNull)
        .groupBy(col("u"), col("cand"))
        .agg(sum(col("cos2_e12")).as("score"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("u")).orderBy(col("score").desc, col("cand"))
      val top = scored.withColumn("rk", row_number().over(wTop))
        .where(col("rk") <= 3)
      test.join(top, Seq("u"), "left")
        .withColumn("hit",
          when(col("cand") === col("held"), 1L).otherwise(0L))
        .agg(countDistinct(col("u")).as("n_users"),
          coalesce(sum(col("hit")), lit(0L)).as("hits"))
        .withColumn("hitrate_ppm", expr("hits * 1000000 div n_users"))
    }),

    // Decision-stump feature ranking by EXACT weighted Gini impurity —
    // the feature-selection pass before training: binary Gini of a
    // split value is (n² − n_pos² − n_neg²)/n², weighted by n_v/N;
    // per-value terms truncate at e9 over the value's own denominator,
    // then roll up over N (two-stage truncation, pinned). One narrow
    // unpivot scan → per-(feature,value) cells → per-feature rows;
    // nothing scales past the feature-value cardinality.
    "q267_gini_stump" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("label",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      val cells = e.select(col("label"), expr(
          """stack(3,
             | 'hour_of_day', CAST((ts_ms div 3600000) % 24 AS STRING),
             | 'user_bucket', CAST(user_id % 7 AS STRING),
             | 'value_band',  CAST(length(bin(CAST(round(value * 100)
             |                AS BIGINT))) AS STRING)
             |) AS (feature, val)""".stripMargin))
        .groupBy(col("feature"), col("val"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"))
        .withColumn("term_e9", expr(
          """CAST((CAST(n AS DECIMAL(38,0)) * n
              - CAST(n_pos AS DECIMAL(38,0)) * n_pos
              - CAST(n - n_pos AS DECIMAL(38,0)) * (n - n_pos))
             * 1000000000 div CAST(n AS DECIMAL(38,0)) AS BIGINT)"""))
      cells.groupBy(col("feature"))
        .agg(count(lit(1)).as("n_values"), sum(col("n")).as("n_rows"),
          expr("CAST(sum(CAST(term_e9 AS DECIMAL(38,0))) div sum(n) AS BIGINT)")
            .as("gini_e9"))
    }),

    // Youden-J optimal threshold for "discount level predicts return"
    // — the full ROC-census cut table with the J-maximizing threshold
    // marked; the "where do we actually cut" companion to the AUC.
    "q403_youden" -> ((s, dir) =>
      operators.EvalCurves.youdenTableE6(t(s, dir, "lineitem"),
        round(col("l_discount") * 100).cast("long"),
        col("l_returnflag") === "R")),

    // Win ratio (Pocock) for the hierarchical composite endpoint
    // (primary: returned; secondary: quantity) between discounted and
    // undiscounted order-lines — pairwise preference counts from
    // censuses, never materialized pairs.
    "q405_win_ratio" -> ((s, dir) =>
      decStr(operators.Preference.winRatioE6(t(s, dir, "lineitem"),
        col("l_discount") > 0.05, col("l_returnflag") === "R",
        round(col("l_quantity")).cast("long")))),

    // pass@k curve (Chen et al. 2021 unbiased estimator): per "problem"
    // (order) the samples are its lineitems, "success" = a returned
    // line; the binomial ratio is two exact DECIMAL(38,0) falling-
    // factorial products, curve at k = 1, 2, 3. One hash aggregate to
    // problem grain; each curve point a single-row reduction.
    "q340_pass_at_k" -> ((s, dir) =>
      decStr(operators.EvalCurves.passAtKCurve(
        t(s, dir, "lineitem"), col("l_orderkey"),
        col("l_returnflag") === "R", ks = Seq(1, 2, 3), maxN = 64))),

    // Unbiased best-of-n reward curve (WebGPT app. I order-statistics
    // estimator): prompt = order, reward = line price in cents, tie =
    // line number; group-local rank window + exact falling-factorial
    // subset weights, curve at n = 1, 2, 3.
    "q341_best_of_n" -> ((s, dir) =>
      decStr(operators.EvalCurves.bestOfNCurve(
        t(s, dir, "lineitem"), col("l_orderkey"),
        cents(col("l_extendedprice")), col("l_linenumber"),
        ns = Seq(1, 2, 3), maxN = 64))),

    // Wilson lower-bound win-rate ranking (z = 49/25 = 1.96): per
    // supplier, wins = returned lines; the bound in cleared-denominator
    // exact integers with a corrected isqrt — the fix for 1/1
    // outranking 90/100 in naive win-rate sorts.
    "q342_wilson_lb" -> ((s, dir) =>
      operators.EvalCurves.wilsonLowerBoundE6(
        t(s, dir, "lineitem"), col("l_suppkey"),
        col("l_returnflag") === "R")),

    // Model-eval gains table: documents scored (length as the ranking
    // score), labeled by containing the token 'spark'; DECILES off the
    // value census (q315's rule at 10), per decile positives + the
    // cumulative capture rate e6 — the lift/gains readout every
    // classifier ships with.
    "q317_gains_table" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("score"),
          (concat(lit(" "), col("text"), lit(" "))
            .contains(" spark ")).cast("long").as("pos"))
      val byV = Window.partitionBy(operators.Census.onePartKey(col("score"))).orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val census = d.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(byV))
        .withColumn("nn", sum(col("cnt")).over(
          Window.partitionBy(operators.Census.onePartKey(col("score")))))
        .select(col("score"), expr("(cum - 1) * 10 div nn + 1").as("decile"))
      val run = Window.partitionBy(operators.Census.onePartKey(col("decile"))).orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      d.join(census, "score")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("positives"))
        .withColumn("cum_pos", sum(col("positives")).over(run))
        .withColumn("total_pos", sum(col("positives")).over(
          Window.partitionBy(operators.Census.onePartKey(col("decile")))))
        .withColumn("capture_e6", expr("cum_pos * 1000000L div total_pos"))
        .select(col("decile"), col("n"), col("positives"),
          col("capture_e6"))
    }),

    // Ranking evaluation: AVERAGE PRECISION per source — documents
    // ranked by length (desc, doc_id tiebreak), relevance = lang 'en';
    // prec@k needs NO second pass: the running relevant-count r at a
    // relevant row IS the numerator, so AP = (Σ r·1e6 div k) div P off
    // one partitioned window. Completes MRR/NDCG (q145) + AUC (q140).
    "q309_avg_precision" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ranked = t(s, dir, "documents")
        .withColumn("rel", (col("lang") === "en").cast("long"))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("r", sum(col("rel")).over(w))
      ranked.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("rel")).as("n_pos"),
          expr("""sum(CASE WHEN rel = 1 THEN r * 1000000L div k END)
            div sum(rel)""").as("ap_e6"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // mirrors TextRank.bm25's pinned double pipeline: (1.2 + 1.0) is
    // spelled as a SUM (double(1.2)+1.0 != double(2.2)); every contribution
    // rounds to micro-units before the order-independent BIGINT sum
    "q72_bm25" -> q72OracleSql,

    // q141: quality replay, decade buckets, exact ppm rates.
    "q141_calibration" ->
      s"""WITH q AS (SELECT $qualityExprSql AS q,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p FROM documents)
         |SELECT q // 10 AS bucket, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(p) AS BIGINT) AS n_pos,
         |  CAST(sum(p) * 1000000 // count(*) AS BIGINT) AS rate_ppm
         |FROM q GROUP BY 1""".stripMargin,

    // q142: the two 1-D slice censuses unioned + the global row, ppm
    // deviations, (dev desc, dim, slice) top-10.
    "q142_slice_finder" ->
      s"""WITH s AS (SELECT lang, source,
         |  CASE WHEN $qualityExprSql >= 75 THEN 1 ELSE 0 END AS p
         | FROM documents),
         |sl AS (
         | SELECT 'lang' AS dim, lang AS slice, count(*) AS n,
         |   sum(p) AS n_pass FROM s GROUP BY 2
         | UNION ALL
         | SELECT 'source' AS dim, source AS slice, count(*) AS n,
         |   sum(p) AS n_pass FROM s GROUP BY 2),
         |f AS (SELECT * FROM sl WHERE n >= 5),
         |g AS (SELECT sum(p) * 1000000 // count(*) AS g_rate_ppm FROM s)
         |SELECT dim, slice, CAST(n AS BIGINT) AS n,
         |  CAST(n_pass AS BIGINT) AS n_pass,
         |  CAST(n_pass * 1000000 // n AS BIGINT) AS rate_ppm,
         |  CAST(g_rate_ppm AS BIGINT) AS g_rate_ppm,
         |  CAST(abs(n_pass * 1000000 // n - g_rate_ppm) AS BIGINT) AS dev_ppm
         |FROM f, g
         |ORDER BY dev_ppm DESC, dim, slice LIMIT 10""".stripMargin,

    // q140: quality replay + the closed-form midrank sum.
    "q140_auc" ->
      s"""WITH q AS (SELECT $qualityExprSql AS s,
         |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p FROM documents),
         |h AS (SELECT s, count(*) AS cnt, sum(p) AS pos FROM q GROUP BY 1),
         |c AS (SELECT s, cnt, pos,
         |  sum(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum,
         |  sum(cnt) OVER () AS n, sum(pos) OVER () AS n_pos FROM h),
         |t AS (SELECT n, n_pos,
         |  sum(pos * (2*(cum - cnt) + cnt + 1)) AS sum2r FROM c GROUP BY 1, 2)
         |SELECT CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST(n - n_pos AS BIGINT) AS n_neg,
         |  CAST(sum2r - n_pos*(n_pos+1) AS BIGINT) AS auc_num,
         |  CAST(2*n_pos*(n - n_pos) AS BIGINT) AS auc_den
         |FROM t""".stripMargin,

    "q98_grouped_topk" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY round(o_totalprice * 100) DESC, o_orderkey) AS BIGINT) AS rank
        |FROM orders
        |QUALIFY rank <= 3""".stripMargin,

    // q184: exact (q20) and IVF (q34) rankings replayed as CTEs, joined
    // on (qid, cid); literal RBO tail weights W(m) for p=9/10, k=3 —
    // 1720000/720000/270000 e6 — with the final (1−p) `div 10`.
    "q184_rbo" ->
      s"""WITH ex AS (SELECT qid, cid, rank FROM ($q20OracleSql)),
         |iv AS (SELECT qid, cid, rank FROM ($q34OracleSql)),
         |m AS (SELECT ex.qid, CAST(count(*) AS BIGINT) AS n_common,
         |   sum(CASE greatest(ex.rank, iv.rank)
         |     WHEN 1 THEN 1720000 WHEN 2 THEN 720000
         |     WHEN 3 THEN 270000 ELSE 0 END) AS wsum
         | FROM ex JOIN iv ON iv.qid = ex.qid AND iv.cid = ex.cid
         | WHERE ex.rank <= 3 AND iv.rank <= 3 GROUP BY 1),
         |qs AS (SELECT DISTINCT qid FROM ex)
         |SELECT qs.qid, coalesce(m.n_common, 0) AS n_common,
         | CAST(coalesce(m.wsum, 0) // 10 AS BIGINT) AS rbo_e6
         |FROM qs LEFT JOIN m USING (qid)""".stripMargin,

    // q185: the NB audit replayed — per-term e6-rounded ln terms summed
    // as integers, OOV test tokens dropped by the inner model join,
    // (score desc, lang) argmax.
    "q185_nb_confusion" ->
      """WITH tk AS (SELECT doc_id, lang, tok FROM (
        |   SELECT doc_id, lang, unnest(regexp_split_to_array(
        |     trim(lower(text)), '\s+')) AS tok FROM documents)
        | WHERE length(tok) > 0),
        |tr AS (SELECT * FROM tk WHERE doc_id % 2 = 0),
        |cnts AS (SELECT lang, tok, count(*) AS cnt FROM tr GROUP BY 1, 2),
        |vocab AS (SELECT DISTINCT tok FROM cnts),
        |vs AS (SELECT count(*) AS v FROM vocab),
        |lt AS (SELECT lang, sum(cnt) AS tot FROM cnts GROUP BY 1),
        |model AS (SELECT vo.tok, lt.lang,
        |   CAST(round((ln(coalesce(c.cnt, 0) + 1) - ln(lt.tot + vs.v))
        |     * 1e6) AS BIGINT) AS term_e6
        | FROM vocab vo CROSS JOIN lt CROSS JOIN vs
        | LEFT JOIN cnts c ON c.tok = vo.tok AND c.lang = lt.lang),
        |td AS (SELECT DISTINCT doc_id, lang FROM tr),
        |nd AS (SELECT lang, count(*) AS nd FROM td GROUP BY 1),
        |ntot AS (SELECT count(*) AS n FROM td),
        |pri AS (SELECT lang, CAST(round((ln(nd) - ln(n)) * 1e6) AS BIGINT)
        |   AS prior_e6 FROM nd CROSS JOIN ntot),
        |tc AS (SELECT doc_id, lang AS actual, tok, count(*) AS c
        | FROM tk WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
        |sc AS (SELECT tc.doc_id, tc.actual, m.lang,
        |   sum(tc.c * m.term_e6) AS ll
        | FROM tc JOIN model m ON m.tok = tc.tok GROUP BY 1, 2, 3),
        |fin AS (SELECT sc.doc_id, sc.actual, sc.lang,
        |   sc.ll + p.prior_e6 AS score
        | FROM sc JOIN pri p ON p.lang = sc.lang),
        |pred AS (SELECT doc_id, actual, lang FROM (SELECT *, row_number()
        |   OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS r
        |  FROM fin) WHERE r = 1)
        |SELECT actual, lang AS predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2""".stripMargin,

    // q206: the whole eval replayed — per-user last-event cut, q143
    // similarity over the train remainder, Σ-sim scoring with history
    // exclusion, (score desc, cand) top-3, integer hit-rate.
    "q206_leave_last_out" ->
      """WITH ev0 AS (SELECT CAST(user_id AS VARCHAR) AS u,
        |  'C' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 20
        |    AS VARCHAR) AS item,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        | FROM events),
        |test AS (SELECT u, item AS held FROM ev0 WHERE rn = 1),
        |inc AS (SELECT DISTINCT u, item FROM ev0 WHERE rn > 1),
        |n AS (SELECT item, count(*) AS n FROM inc GROUP BY 1),
        |p AS (SELECT x.item AS item_a, y.item AS item_b, count(*) AS cooc
        |      FROM inc x JOIN inc y ON x.u = y.u AND x.item < y.item
        |      GROUP BY 1, 2 HAVING count(*) >= 5),
        |sims AS (SELECT item_a, item_b,
        |  cooc * cooc * 1000000000000 // (na.n * nb.n) AS cos2
        | FROM p JOIN n na ON na.item = item_a JOIN n nb ON nb.item = item_b),
        |sb AS (SELECT item_a AS h, item_b AS cand, cos2 FROM sims
        | UNION ALL SELECT item_b, item_a, cos2 FROM sims),
        |sc AS (SELECT i.u, s.cand, sum(s.cos2) AS score
        | FROM inc i JOIN sb s ON s.h = i.item
        | LEFT JOIN inc o ON o.u = i.u AND o.item = s.cand
        | WHERE o.u IS NULL GROUP BY 1, 2),
        |top AS (SELECT u, cand FROM (SELECT u, cand, row_number() OVER
        |   (PARTITION BY u ORDER BY score DESC, cand) AS rk FROM sc)
        | WHERE rk <= 3)
        |SELECT CAST(count(DISTINCT t.u) AS BIGINT) AS n_users,
        | CAST(coalesce(sum(CASE WHEN tp.cand = t.held THEN 1 END), 0)
        |   AS BIGINT) AS hits,
        | CAST(coalesce(sum(CASE WHEN tp.cand = t.held THEN 1 END), 0)
        |   * 1000000 // count(DISTINCT t.u) AS BIGINT) AS hitrate_ppm
        |FROM test t LEFT JOIN top tp ON tp.u = t.u""".stripMargin,

    // q267: same unpivot, same two-stage e9 truncation in HUGEINT.
    "q267_gini_stump" ->
      """WITH e AS (SELECT
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
        |  epoch_ms(ts) AS ts_ms, user_id,
        |  CAST(round(value*100) AS BIGINT) AS v FROM events),
        |u AS (
        | SELECT 'hour_of_day' AS feature,
        |  CAST((ts_ms // 3600000) % 24 AS VARCHAR) AS val, label FROM e
        | UNION ALL SELECT 'user_bucket',
        |  CAST(user_id % 7 AS VARCHAR), label FROM e
        | UNION ALL SELECT 'value_band',
        |  CAST(length(format('{:b}', v)) AS VARCHAR), label FROM e),
        |c AS (SELECT feature, val, count(*) AS n, sum(label) AS n_pos
        | FROM u GROUP BY 1, 2),
        |t AS (SELECT feature, n,
        |  CAST((CAST(n AS HUGEINT)*n - CAST(n_pos AS HUGEINT)*n_pos
        |        - CAST(n - n_pos AS HUGEINT)*(n - n_pos))
        |   * 1000000000 // CAST(n AS HUGEINT) AS BIGINT) AS term_e9
        | FROM c)
        |SELECT feature, count(*) AS n_values, CAST(sum(n) AS BIGINT)
        |  AS n_rows,
        | CAST(sum(CAST(term_e9 AS HUGEINT))
        |   // sum(CAST(n AS HUGEINT)) AS BIGINT) AS gini_e9
        |FROM t GROUP BY 1""".stripMargin,

    // q403: descending ROC-census windows; best-J by struct-min
    // (−j, t) — lower threshold wins ties.
    "q403_youden" ->
      """WITH b AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS t,
        |  l_returnflag = 'R' AS p FROM lineitem),
        |census AS (SELECT t,
        |  CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |  CAST(sum(CASE WHEN p THEN 0 ELSE 1 END) AS BIGINT) AS nn
        | FROM b GROUP BY 1),
        |cum AS (SELECT t, np, nn,
        |  sum(np) OVER wge AS tp, sum(nn) OVER wge AS fp,
        |  sum(np) OVER () AS pp, sum(nn) OVER () AS nneg
        | FROM census WINDOW wge AS (ORDER BY t DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (SELECT t, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp,
        |  CAST(tp * 1000000 // pp AS BIGINT) AS tpr_e6,
        |  CAST(fp * 1000000 // nneg AS BIGINT) AS fpr_e6
        | FROM cum WHERE pp > 0 AND nneg > 0),
        |jj AS (SELECT *, tpr_e6 - fpr_e6 AS j_e6 FROM j),
        |bb AS (SELECT min(struct_pack(nj := -j_e6, t := t)) AS b
        | FROM jj)
        |SELECT jj.t, tp, fp, tpr_e6, fpr_e6, j_e6,
        | (j_e6 = -(bb.b.nj) AND jj.t = bb.b.t) AS is_best
        |FROM jj, bb""".stripMargin,

    // q405: (bad, secondary) cell censuses per arm, census×census
    // pair mass in HUGEINT.
    "q405_win_ratio" ->
      """WITH b AS (SELECT l_discount > 0.05 AS tr,
        |  l_returnflag = 'R' AS bad,
        |  CAST(round(l_quantity) AS BIGINT) AS sec FROM lineitem),
        |cells AS (SELECT tr, bad, sec, CAST(count(*) AS BIGINT) AS n
        | FROM b GROUP BY 1, 2, 3),
        |t AS (SELECT bad AS tb, sec AS ts, n AS nt FROM cells
        | WHERE tr),
        |c AS (SELECT bad AS cb, sec AS cs, n AS nc FROM cells
        | WHERE NOT tr),
        |ag AS (SELECT
        |  coalesce(sum(CASE WHEN (NOT tb AND cb)
        |    OR (tb = cb AND ts > cs)
        |   THEN CAST(nt AS HUGEINT) * nc END), 0) AS wins,
        |  coalesce(sum(CASE WHEN (tb AND NOT cb)
        |    OR (tb = cb AND ts < cs)
        |   THEN CAST(nt AS HUGEINT) * nc END), 0) AS losses,
        |  coalesce(sum(CASE WHEN tb = cb AND ts = cs
        |   THEN CAST(nt AS HUGEINT) * nc END), 0) AS ties
        | FROM t, c),
        |nt2 AS (SELECT CAST(coalesce(sum(nt), 0) AS BIGINT)
        |  AS n_treated FROM t),
        |nc2 AS (SELECT CAST(coalesce(sum(nc), 0) AS BIGINT)
        |  AS n_control FROM c)
        |SELECT n_treated, n_control,
        | CAST(CAST(wins AS DECIMAL(38,0)) AS VARCHAR) AS wins,
        | CAST(CAST(losses AS DECIMAL(38,0)) AS VARCHAR) AS losses,
        | CAST(CAST(ties AS DECIMAL(38,0)) AS VARCHAR) AS ties,
        | CASE WHEN losses > 0 THEN
        |  CAST(wins * 1000000 // losses AS BIGINT)
        | END AS win_ratio_e6
        |FROM ag, nt2, nc2""".stripMargin,

    // q340: the k=1..3 binomial ratios unrolled as HUGEINT falling
    // factorials — same products the Spark side builds per curve point.
    "q340_pass_at_k" ->
      """WITH per AS (SELECT l_orderkey AS p, count(*) AS n,
        |  sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c
        | FROM lineitem GROUP BY 1),
        |pe AS (SELECT k, CASE WHEN n - c < k THEN 1000000
        |   ELSE 1000000 - (CASE k
        |     WHEN 1 THEN CAST(n-c AS HUGEINT)
        |     WHEN 2 THEN CAST(n-c AS HUGEINT)*(n-c-1)
        |     ELSE CAST(n-c AS HUGEINT)*(n-c-1)*(n-c-2) END * 1000000
        |    // (CASE k WHEN 1 THEN CAST(n AS HUGEINT)
        |     WHEN 2 THEN CAST(n AS HUGEINT)*(n-1)
        |     ELSE CAST(n AS HUGEINT)*(n-1)*(n-2) END)) END AS pass_e6
        | FROM per CROSS JOIN (VALUES (1),(2),(3)) ks(k) WHERE n >= k)
        |SELECT k, count(*) AS n_problems,
        | CAST(CAST(sum(pass_e6) AS HUGEINT) AS VARCHAR) AS sum_pass_e6,
        | CAST(CAST(sum(pass_e6) AS HUGEINT) // count(*) AS BIGINT)
        |   AS mean_pass_e6
        |FROM pe GROUP BY 1""".stripMargin,

    // q341: group-local rank window, then the n=1..3 falling-factorial
    // subset weights; the (n−1)!/n! pair cancels to a single ×n.
    "q341_best_of_n" ->
      """WITH s AS (SELECT l_orderkey AS p,
        |  CAST(round(l_extendedprice*100) AS BIGINT) AS r,
        |  l_linenumber AS t FROM lineitem),
        |rk AS (SELECT p, r,
        |  row_number() OVER (PARTITION BY p ORDER BY r, t) AS i,
        |  count(*) OVER (PARTITION BY p) AS nn
        | FROM s),
        |pp AS (SELECT n, p,
        |  sum((CASE n WHEN 1 THEN CAST(1 AS HUGEINT)
        |      WHEN 2 THEN CAST(i-1 AS HUGEINT)
        |      ELSE CAST(i-1 AS HUGEINT)*(i-2) END) * r) AS num,
        |  max(CASE n WHEN 1 THEN CAST(nn AS HUGEINT)
        |      WHEN 2 THEN CAST(nn AS HUGEINT)*(nn-1)
        |      ELSE CAST(nn AS HUGEINT)*(nn-1)*(nn-2) END) AS dn
        | FROM rk CROSS JOIN (VALUES (1),(2),(3)) ns(n)
        | WHERE nn >= n AND i >= n GROUP BY 1, 2),
        |pe AS (SELECT n,
        |  CAST(num * n * 1000000 // dn AS BIGINT) AS best_e6 FROM pp)
        |SELECT n, count(*) AS n_prompts,
        | CAST(CAST(sum(best_e6) AS HUGEINT) AS VARCHAR) AS sum_best_e6,
        | CAST(CAST(sum(best_e6) AS HUGEINT) // count(*) AS BIGINT)
        |   AS mean_best_e6
        |FROM pe GROUP BY 1""".stripMargin,

    // q342: the cleared-denominator Wilson form with the corrected
    // isqrt CASE — term for term the Spark expression.
    "q342_wilson_lb" ->
      """WITH per AS (SELECT l_suppkey AS item,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS wins,
        |  count(*) AS trials
        | FROM lineitem GROUP BY 1),
        |v AS (SELECT item, wins, trials,
        |  CAST(trials AS HUGEINT) * (2500 * CAST(wins AS HUGEINT)
        |    * (trials - wins) + 2401 * CAST(trials AS HUGEINT)) AS vn
        | FROM per),
        |r0 AS (SELECT *,
        |  CAST(floor(sqrt(CAST(vn AS DOUBLE))) AS BIGINT) AS s0 FROM v),
        |r AS (SELECT item, wins, trials, vn,
        |  CASE WHEN CAST(s0 AS HUGEINT)*s0 > vn THEN s0 - 1
        |   WHEN (CAST(s0 AS HUGEINT)+1)*(s0+1) <= vn THEN s0 + 1
        |   ELSE s0 END AS rt
        | FROM r0)
        |SELECT item, wins, trials,
        | CAST((1250 * CAST(trials AS HUGEINT) * wins
        |    + 2401 * CAST(trials AS HUGEINT) - 49 * CAST(rt AS HUGEINT))
        |   * 1000000
        |  // (1250 * CAST(trials AS HUGEINT) * trials
        |    + 4802 * CAST(trials AS HUGEINT)) AS BIGINT) AS wilson_lb_e6
        |FROM r""".stripMargin,

    // q317: census deciles + running capture.
    "q317_gains_table" ->
      """WITH d AS (SELECT doc_id, n_chars AS score,
        |  CASE WHEN ' ' || text || ' ' LIKE '% spark %' THEN 1 ELSE 0
        |   END AS pos
        | FROM documents),
        |c AS (SELECT score,
        |  (sum(count(*)) OVER (ORDER BY score DESC) - 1) * 10
        |    // (SELECT count(*) FROM d) + 1 AS decile
        | FROM d GROUP BY score),
        |g AS (SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(pos) AS BIGINT) AS positives
        | FROM d JOIN c USING (score) GROUP BY 1)
        |SELECT decile, n, positives,
        | CAST(sum(positives) OVER (ORDER BY decile) * 1000000
        |  // (SELECT sum(positives) FROM g) AS BIGINT) AS capture_e6
        |FROM g""".stripMargin,

    // q309: the same partitioned running-count windows.
    "q309_avg_precision" ->
      """WITH r AS (
        | SELECT source, lang,
        |  count(*) OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS k,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS rr
        | FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_pos,
        | CAST(CASE WHEN sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) = 0
        |  THEN NULL
        |  ELSE sum(CASE WHEN lang = 'en' THEN rr * 1000000 // k END)
        |    // sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) END
        |  AS BIGINT) AS ap_e6
        |FROM r GROUP BY 1""".stripMargin,
  )
}
