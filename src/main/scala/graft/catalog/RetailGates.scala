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

/** Tpc-h-flavor business analytics: revenue, cohorts, rfm, market share, star rollups.
  *
  * 23 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object RetailGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Curation trade-off skyline: undominated (quality max, length min)
    // cells — no pairwise join, one cell census + two window minima.
    "q146_doc_skyline" -> ((s, dir) =>
      Skyline.frontier2D(
        t(s, dir, "documents").select(
          TextFunctions.qualityScore(col("text")).as("q"), col("n_chars")),
        col("q"), col("n_chars"), "quality", "n_chars")),

    // Metric pivot: the wide day × event-type cents table (the A11
    // metric-column union inverted) — one groupBy().pivot() with the
    // value list pinned, so the plan is a single aggregation with no
    // value-discovery pre-pass.
    "q149_metric_pivot" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(expr("ts_ms div 86400000").as("day_x"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sum(cents(col("value"))))),

    // CUBE over (event_type, day-of-week): all four grouping-set
    // marginals in one pass (the q103 ROLLUP widened), nulls
    // sentinel-coalesced for the cross-engine hash.
    "q156_cube_metrics" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("dow", expr("(ts_ms div 86400000 + 4) % 7"))
        .cube(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("dow"), lit(-1L)).as("dow"), col("n"),
          col("sum_cents"))),

    // Cohort LTV triangle: first-seen day cohorts, per-age revenue
    // cells, running cumulative per cohort — the window rides the
    // census, never the event rows.
    "q160_cohort_ltv" -> ((s, dir) =>
      Retention.cohortLtv(ev(s, dir), "user_id", "ts_ms",
        cents(col("value")), bucketMs = 86400000L)),

    // TPC-H Q9-shape profit rollup: the five-way star join bench anchor
    // — fact side joins three BROADCAST dims (filtered part first, so
    // the selective prune lands before the fact shuffle) plus the
    // orders fact-to-fact join; integer e4 money.
    "q165_profit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .where(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long")
          .as("o_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")).as("profit_e4"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q8-shape market share: one nation's ppm share of yearly
    // revenue into one region — conditional aggregation over the same
    // star, exact integer ratio.
    "q166_market_share" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").as("cn")),
          col("c_nationkey") === col("cn.n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("cn.n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").as("sn")),
          col("s_nationkey") === col("sn.n_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")).as("total_e4"),
          sum(when(col("sn.n_name") === "NATION_3",
            round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 10000).cast("long")).otherwise(0L)).as("nation_e4"))
        .withColumn("share_ppm", expr("nation_e4 * 1000000 div total_e4"))),

    // Window-function breadth on one per-customer sort: sequence number,
    // inter-order gap days, running revenue, ntile quartile, exact ppm
    // share of the customer total — the classic warehouse order ledger.
    "q173_customer_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
        expr("unix_millis(o_orderdate) div 86400000").as("day"),
        cents(col("o_totalprice")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("day"), col("o_orderkey"))
      val run = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
      o.select(col("o_custkey"), col("o_orderkey"), col("c"),
          row_number().over(w).cast("long").as("seq"),
          coalesce(col("day") - lag(col("day"), 1).over(w), lit(-1L))
            .as("gap_days"),
          sum(col("c")).over(run).as("run_cents"),
          ntile(4).over(w).cast("long").as("quartile"),
          sum(col("c")).over(all).as("__total"))
        // integer div, never a double ratio: the share must floor exactly
        .withColumn("share_ppm", expr("c * 1000000 div __total"))
        .drop("c", "__total")
    }),

    // Audience churn: exact day-over-day Jaccard of active-user sets —
    // per-bucket censuses + one shifted equi-join, all integers.
    "q174_audience_churn" -> ((s, dir) =>
      Retention.audienceChurn(ev(s, dir), "user_id", "ts_ms",
        bucketMs = 86400000L)),

    // Daily percentile dashboard: exact p50/p95/p99 of cents per
    // (event_type, day) from per-group value histograms — census
    // windows, no row sort.
    "q175_daily_percentiles" -> ((s, dir) =>
      ExactQuantiles.groupedHistogramPercentiles(
        ev(s, dir).select(col("event_type"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"),
          cents(col("value")).as("c")),
        Seq("event_type", "day_ms"), col("c"), Seq(50, 95, 99))),

    // Behavioral diversity: per-user event-type entropy in micro-nats
    // (the q106 pinned per-term ln chain, integer-summed) + the
    // deterministic modal type — the engagement-breadth feature.
    "q179_user_entropy" -> ((s, dir) => {
      val cnts = ev(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
      cnts
        .withColumn("n", sum(col("cnt")).over(all))
        .withColumn("term_e6", round(col("cnt").cast("double") *
          (log(col("n")) - log(col("cnt"))) * lit(1000000.0) / col("n"))
          .cast("long"))
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("term_e6")).as("entropy_e6"),
          // modal type, (count desc, type asc) totalized: struct-min
          // over (−cnt, type)
          min(struct((-col("cnt")).as("nc"), col("event_type").as("t")))
            .as("__m"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          col("entropy_e6"), col("__m.t").as("mode_type"))
    }),

    // Two-level derived-table CASCADE (hour→day→week rollup shape): the
    // daily CDC-maintained aggregate is ITSELF an UpsertTable, so a
    // second DerivedAggTable maintains the 5-day-bucket rollup off the
    // daily one's commits — refresh cost at each level scales with
    // churned groups, and the bucket partition prunes the daily scan.
    // The oracle recomputes the rollup straight from resolved raw events
    // (bucket = epoch-ms div 5 days: pure integers, no week-numbering
    // convention to disagree on).
    "q196_rollup_cascade" -> ((s, dir) => {
      val base = ev(s, dir).select(
        col("event_id").as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("cast(ts_ms div 432000000 as string)").as("wk"),
        cents(col("value")).as("v_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val c2 = base.where(col("k") % 11 === 0)
        .withColumn("v_cents", col("v_cents") + 500L)
        .withColumn("ver", lit(2L)).withColumn("del", lit(false))
      val root = queryTmp("graft_cascade_q196")
      val src = new sinks.UpsertTable(s"$root/src", Seq("k"), "ver",
        Seq("day"), Some("del"))
      val drvDay = new sinks.UpsertTable(s"$root/day", Seq("day"), "__ver",
        Seq("wk"), Some("__dead"))
      val drvWk = new sinks.UpsertTable(s"$root/wk", Seq("wk"), "__ver",
        Nil, Some("__dead"))
      val daily = new sinks.DerivedAggTable(src, drvDay, Seq("day"),
        df => df.groupBy("day")
          .agg(count(lit(1)).as("n"), sum("v_cents").as("cents"))
          // wk is functionally dependent on day — carried for the daily
          // table's bucket partitioning (the cascade's prune key)
          .withColumn("wk", expr(
            "cast((unix_date(to_date(day)) * 86400000L) div 432000000 as string)"))
          .select(col("day"), col("wk"), col("n"), col("cents")),
        s"$root/_ckpt_day")
      val weekly = new sinks.DerivedAggTable(drvDay, drvWk, Seq("wk"),
        df => df.groupBy("wk").agg(sum("n").as("n"),
          sum("cents").as("cents"), count(lit(1)).as("n_days")),
        s"$root/_ckpt_wk")
      src.upsert(c1)
      daily.refresh(s); weekly.refresh(s)
      src.upsert(c2)
      daily.refresh(s); weekly.refresh(s)
      drvWk.snapshot(s).select("wk", "n", "cents", "n_days")
    }),

    // Market-basket association rules over (order, supplier) baskets:
    // exact integer support / confidence ppm / lift ppm, hub-basket
    // guard, directional rules at support ≥ 10.
    "q212_assoc_rules" -> ((s, dir) =>
      operators.AssociationRules.rules(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        "l_orderkey", "l_suppkey", minSupport = 10L)),

    // TPC-H Q17-shape: revenue trapped in unusually small orders — the
    // correlated "quantity < 20% of this part's average" filter becomes
    // one per-part aggregate joined back to the fact (AQE broadcasts the
    // ~20k-row agg side); the threshold is decided in integer arithmetic
    // (5·qty·cnt < sum_qty ⟺ qty < 0.2·avg) so no double ever compares.
    "q220_small_qty_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .where(col("p_brand") === "Brand#1").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * 10000).cast("long").as("price_e4"))
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .where(col("qty") * 5L * col("cnt") < col("sum_qty"))
        .agg(sum(col("price_e4")).as("small_revenue_e4"),
          count(lit(1)).as("n_small"))
    }),

    // TPC-H Q21-shape: suppliers who alone held up a multi-supplier
    // order ("late" = shipped >90 days after the order date, the
    // receipt/commit-date analogue this schema supports). The classic
    // exists/not-exists pair is re-expressed as ONE per-order aggregate
    // (distinct suppliers, distinct late suppliers) — no quadratic
    // self-anti-join; the fact shuffles once on orderkey.
    "q221_waiting_supplier" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val perOrder = l.groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
        .where(col("n_supp") > 1 && col("n_late") === 1)
      l.where(col("late"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .join(perOrder, col("l_orderkey") === col("ok"))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    }),

    // TPC-H Q22-shape: well-funded customers (balance above the mean
    // POSITIVE balance of their cohort) who never ordered — a scalar
    // aggregate broadcast back as a cross join (bal·cnt > sum decides in
    // integer cents) plus a LEFT ANTI join against orders, grouped by
    // nation. The anti join build side is just distinct custkeys.
    "q222_idle_rich_customers" -> ((s, dir) => {
      val cohort = t(s, dir, "customer")
        .where(col("c_nationkey").isin(0, 3, 7, 11, 13, 17, 19, 23))
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val thr = cohort.where(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("pos_sum"),
          count(lit(1)).as("pos_cnt"))
      cohort.crossJoin(broadcast(thr))
        .where(col("bal_cents") * col("pos_cnt") > col("pos_sum"))
        .join(t(s, dir, "orders").select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal_cents")).as("totacctbal_cents"))
    }),

    // TPC-H Q20-shape: suppliers who DOMINATE the 1996 supply of some
    // red part (their shipped quantity exceeds half the part's total —
    // the availqty-threshold analogue without a partsupp table). Nested
    // correlated-subquery semantics become two aggregates over one
    // broadcast-pruned scan + a semi join into supplier.
    "q223_dominant_supplier" -> ((s, dir) => {
      val red = t(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1996)
        .join(broadcast(t(s, dir, "part")
          .where(col("p_name").contains("red")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity")).cast("long").as("qty"))
      val perPair = red.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("supp_qty"))
      val perPart = red.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("part_qty"))
      val dominant = perPair.join(perPart, col("l_partkey") === col("pk"))
        .where(col("supp_qty") * 2L > col("part_qty"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        .join(broadcast(dominant),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
    }),

    // Dashboard "top-k + OTHER" rollup: per day, the top-2 revenue event
    // types keep their names, the tail lumps into OTHER — rank window,
    // conditional regroup, one exchange each.
    "q228_topk_other" -> ((s, dir) => {
      val daily = ev(s, dir)
        .groupBy(expr("ts_ms div 86400000").as("day"), col("event_type"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
        .orderBy(col("cents").desc, col("event_type"))
      daily.withColumn("rk", row_number().over(w))
        .withColumn("grp", when(col("rk") <= 2, col("event_type"))
          .otherwise("OTHER"))
        .groupBy(col("day"), col("grp"))
        .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n_types"))
    }),

    // TPC-H Q18-shape: large-quantity orders — the IN-subquery-with-
    // HAVING silhouette as one per-order aggregate reused as a semi
    // filter (AQE broadcasts the small qualifying set); customer dim
    // broadcast for the name attach.
    "q242_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("total_qty"))
        .where(col("total_qty") > 300L)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long")
            .as("o_totalprice_cents"),
          col("total_qty"))
    }),

    // TPC-H Q15-shape: top supplier(s) by a quarter's revenue — the
    // max-equality scalar subquery WITH TIES: revenue census, one-row
    // max broadcast back, equality join keeps every tied supplier.
    "q243_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1996 &&
          month(col("l_shipdate")) <= 3)
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000).cast("long")).as("total_rev_e4"))
      val mx = rev.agg(max(col("total_rev_e4")).as("mx"))
      t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(mx))
        .where(col("total_rev_e4") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
    }),

    // TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    // BOTH join sides — the disjunction that naive planners evaluate
    // post-join on every row. Catalyst must split it: the per-side
    // residuals (p_brand IN (…), the l_quantity range hull) are
    // extractable and push to each parquet scan, the part side
    // broadcasts, and the full disjunction evaluates only on the
    // pre-filtered join output (PlanSpec pins brand pushdown +
    // broadcast). One row out: item count + revenue in e4.
    "q247_disjunct_revenue" -> ((s, dir) => {
      val qty = round(col("l_quantity")).cast("long")
      val pred =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          qty.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          qty.between(10, 20)) ||
        (col("p_brand") === "Brand#21" && col("p_size").between(1, 15) &&
          qty.between(20, 30))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .where(pred)
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")).as("revenue_e4"))
    }),

    // A-priori frequent supplier TRIPLES over order baskets (q212 stops
    // at pairs): level-wise downward-closure pruning — F1-filtered
    // items, F2-filtered pair occurrences, (i2,i3)-leg semi-check —
    // so the level-3 join consumes survivors, not raw baskets.
    "q253_freq_triples" -> ((s, dir) =>
      operators.AssociationRules.frequentTriples(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        "l_orderkey", "l_suppkey", minSupport = 5L)),

    // Star-schema rollup: the 6-way star (lineitem ⋈ orders ⋈ customer
    // ⋈ nation ⋈ region ⋈ part) aggregated at THREE granularities in
    // one pass via ROLLUP((region, brand) → (region) → ()) — the
    // dashboard cube a BI layer asks the warehouse for. Tiny dims
    // broadcast explicitly; one fact scan feeds the whole cube
    // (Expand), never one scan per granularity.
    "q316_star_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_quantity") <= 30)
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("r_name"), col("p_brand"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long").as("rev_e4"))
        .rollup(col("r_name"), col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("rev_e4")).as("rev_e4"))
        .select(coalesce(col("r_name"), lit("(all)")).as("r_name"),
          coalesce(col("p_brand"), lit("(all)")).as("p_brand"),
          col("n"), col("rev_e4"))
    }),

    // RFM segmentation: per customer recency/frequency/monetary exact
    // quintiles off the VALUE CENSUS — q(v) = (cum(v)−1)·5 div n + 1,
    // so ties share a bucket by construction and no per-row global rank
    // ever exists (the census window runs over distinct VALUES; the
    // PrefixScan operator is the full-scale path for that step). Output
    // is the 5×5×5 segment census with revenue — the classic CRM cut.
    "q315_rfm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .withColumn("day", expr(
          "CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"))
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(col("day")).as("r"), count(lit(1)).as("f"),
          sum(col("cents")).as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def quintile(df: DataFrame, c: String): DataFrame = {
        val byV = Window.partitionBy(operators.Census.onePartKey(col(c))).orderBy(col(c))
          .rowsBetween(Window.unboundedPreceding, 0)
        val census = df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(byV))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(operators.Census.onePartKey(col(c)))))
          .select(col(c),
            expr("(cum - 1) * 5 div n + 1").as(s"${c}_q"))
        df.join(census, c)
      }
      val scored = quintile(quintile(quintile(rfm, "r"), "f"), "m")
      scored.groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("customers"), sum(col("m")).as("cents"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // q146: same cell census + two window minima (strictly-higher-q
    // frame as an integer RANGE bound).
    "q146_doc_skyline" ->
      s"""WITH s AS (SELECT $qualityExprSql AS q, n_chars AS c FROM documents),
         |cells AS (SELECT q, c, count(*) AS n_rows FROM s GROUP BY 1, 2),
         |w AS (SELECT q, c, n_rows,
         |  min(c) OVER (ORDER BY q
         |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS mh,
         |  min(c) OVER (PARTITION BY q) AS ms
         | FROM cells)
         |SELECT CAST(q AS BIGINT) AS quality, CAST(c AS BIGINT) AS n_chars,
         |  CAST(n_rows AS BIGINT) AS n_rows
         |FROM w WHERE (mh IS NULL OR mh > c) AND ms = c""".stripMargin,

    // q149: pivot as FILTERed aggregates, NULL for absent cells (both
    // engines leave missing combinations NULL).
    "q149_metric_pivot" ->
      """SELECT epoch_ms(ts) // 86400000 AS day_x,
        |  CAST(sum(CASE WHEN event_type = 'click'
        |    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error'
        |    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup'
        |    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view'
        |    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS view
        |FROM events GROUP BY 1""".stripMargin,

    // q156: GROUP BY CUBE with the same sentinels.
    "q156_cube_metrics" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |  CAST(coalesce(dow, -1) AS BIGINT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM (SELECT event_type,
        |    (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |GROUP BY CUBE(event_type, dow)""".stripMargin,

    // q160: same cohort-min join, census cells, cumulative window.
    "q160_cohort_ltv" ->
      """WITH e AS (SELECT user_id AS u,
        |  epoch_ms(ts) - epoch_ms(ts) % 86400000 AS b,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT u, min(b) AS cohort_ms FROM e GROUP BY 1),
        |cells AS (SELECT cohort_ms, (b - cohort_ms) // 86400000 AS age,
        |  count(*) AS n_events, sum(cents) AS sum_cents
        | FROM e JOIN c USING (u) GROUP BY 1, 2)
        |SELECT cohort_ms, CAST(age AS BIGINT) AS age,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(sum_cents AS BIGINT) AS sum_cents,
        |  CAST(sum(sum_cents) OVER (PARTITION BY cohort_ms ORDER BY age
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
        |FROM cells""".stripMargin,

    // q165: the Q9 shape with the q01 money discipline.
    "q165_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |   AS BIGINT) AS profit_e4,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    // q166: the Q8 shape, conditional integer sums, exact ppm share.
    "q166_market_share" ->
      """WITH base AS (
        | SELECT year(o_orderdate) AS o_year,
        |  CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT) AS e4,
        |  sn.n_name AS supp_nation
        | FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        | JOIN region ON cn.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | WHERE r_name = 'ASIA')
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        | CAST(sum(e4) AS BIGINT) AS total_e4,
        | CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 ELSE 0 END)
        |   AS BIGINT) AS nation_e4,
        | CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 ELSE 0 END)
        |   * 1000000 // sum(e4) AS BIGINT) AS share_ppm
        |FROM base GROUP BY 1""".stripMargin,

    // q173: same sort, same five window readouts.
    "q173_customer_orders" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |  epoch_ms(o_orderdate) // 86400000 AS day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS seq,
        |  CAST(coalesce(day - lag(day) OVER w, -1) AS BIGINT) AS gap_days,
        |  CAST(sum(c) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(c * 1000000 // sum(c) OVER (PARTITION BY o_custkey)
        |    AS BIGINT) AS share_ppm
        |FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)""".stripMargin,

    // q174: distinct (user, day), shifted self-join, integer Jaccard.
    "q174_audience_churn" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |  epoch_ms(ts) - epoch_ms(ts) % 86400000 AS b FROM events),
        |s AS (SELECT b, count(*) AS n FROM a GROUP BY 1),
        |i AS (SELECT c.b, count(*) AS n_inter FROM a c
        |      JOIN a p ON p.u = c.u AND p.b = c.b - 86400000 GROUP BY 1)
        |SELECT s.b AS bucket_ms, CAST(s.n AS BIGINT) AS n_active,
        |  CAST(sp.n AS BIGINT) AS n_prev,
        |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
        |  CAST(coalesce(i.n_inter, 0) * 1000000
        |    // (s.n + sp.n - coalesce(i.n_inter, 0)) AS BIGINT) AS jaccard_ppm
        |FROM s JOIN s sp ON sp.b = s.b - 86400000
        |LEFT JOIN i ON i.b = s.b""".stripMargin,

    // q175: per-(type, day) value census, cumulative rank rule.
    "q175_daily_percentiles" ->
      """WITH e AS (SELECT event_type,
        |  epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
        |  CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |h AS (SELECT event_type, day_ms, v, count(*) AS c
        |      FROM e GROUP BY 1, 2, 3),
        |w AS (SELECT *, sum(c) OVER (PARTITION BY event_type, day_ms
        |    ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(c) OVER (PARTITION BY event_type, day_ms) AS n FROM h),
        |x AS (SELECT event_type, day_ms, v, cum, n, p.percent
        | FROM w, (VALUES (50), (95), (99)) p(percent)
        | WHERE cum * 100 >= n * p.percent)
        |SELECT event_type, day_ms, CAST(percent AS BIGINT) AS percent,
        |  CAST(min(v) AS BIGINT) AS quantile
        |FROM x GROUP BY 1, 2, 3""".stripMargin,

    // q179: same census, same pinned ln chain, (-cnt, type) mode rule.
    "q179_user_entropy" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS cnt
        | FROM events GROUP BY 1, 2),
        |w AS (SELECT *, sum(cnt) OVER (PARTITION BY user_id) AS n FROM c),
        |t AS (SELECT *, CAST(round(CAST(cnt AS DOUBLE)
        |  * (ln(n) - ln(cnt)) * 1000000 / n) AS BIGINT) AS term_e6 FROM w),
        |m AS (SELECT user_id, event_type AS mode_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY cnt DESC, event_type) AS rk FROM c) WHERE rk = 1)
        |SELECT t.user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(term_e6) AS BIGINT) AS entropy_e6,
        |  max(mode_type) AS mode_type
        |FROM t JOIN m ON m.user_id = t.user_id
        |GROUP BY 1""".stripMargin,

    // q196: 5-day-bucket rollup straight off resolved events (ver-2
    // rows win for k % 11); n_days = distinct active days per bucket.
    "q196_rollup_cascade" ->
      """WITH e AS (SELECT event_id AS k, strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(epoch_ms(ts) // 432000000 AS VARCHAR) AS wk,
        |  CAST(round(value * 100) AS BIGINT)
        |    + CASE WHEN event_id % 11 = 0 THEN 500 ELSE 0 END AS v_cents
        | FROM events)
        |SELECT wk, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(v_cents) AS BIGINT) AS cents,
        | CAST(count(DISTINCT day) AS BIGINT) AS n_days
        |FROM e GROUP BY 1""".stripMargin,

    // q212: size-2 association rules, integer ppm confidence/lift.
    "q212_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
        |  FROM lineitem),
        |sized AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 200),
        |kept AS (SELECT bi.b, bi.i FROM bi JOIN sized USING (b)),
        |nb AS (SELECT count(DISTINCT b) AS n FROM kept),
        |isupp AS (SELECT i, count(*) AS supp FROM kept GROUP BY i),
        |ps AS (SELECT x.i AS antecedent, y.i AS consequent,
        |   count(*) AS support
        | FROM kept x JOIN kept y ON x.b = y.b AND x.i <> y.i
        | GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT antecedent, consequent, support,
        | a.supp AS antecedent_support,
        | 1000000 * support // a.supp AS confidence_ppm,
        | 1000000 * support * nb.n // (a.supp * c.supp) AS lift_ppm
        |FROM ps JOIN isupp a ON ps.antecedent = a.i
        |JOIN isupp c ON ps.consequent = c.i CROSS JOIN nb""".stripMargin,

    // q220: the textbook correlated scalar subquery — DuckDB decorrelates
    // it its own way; the gate proves the agg-join rewrite is equivalent.
    "q220_small_qty_revenue" ->
      """WITH li AS (
        | SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 10000) AS BIGINT) AS price_e4
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#1')
        |SELECT CAST(sum(price_e4) AS BIGINT) AS small_revenue_e4,
        | count(*) AS n_small
        |FROM li a
        |WHERE a.qty * 5 * (SELECT count(*) FROM li b
        |    WHERE b.l_partkey = a.l_partkey)
        |  < (SELECT sum(qty) FROM li b
        |    WHERE b.l_partkey = a.l_partkey)""".stripMargin,

    // q221: the textbook EXISTS / NOT EXISTS pair over the same lateness
    // definition — proves the per-order-aggregate rewrite is equivalent.
    "q221_waiting_supplier" ->
      """WITH l AS (
        | SELECT l_orderkey, l_suppkey,
        |  (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F')
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late) l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM l l2
        |   WHERE l2.l_orderkey = l1.l_orderkey
        |     AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |   WHERE l3.l_orderkey = l1.l_orderkey
        |     AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY 1, 2""".stripMargin,

    // q222: scalar subquery + NOT EXISTS, integer-cents threshold.
    "q222_idle_rich_customers" ->
      """WITH cohort AS (
        | SELECT c_custkey, c_nationkey,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        | FROM customer
        | WHERE c_nationkey IN (0, 3, 7, 11, 13, 17, 19, 23))
        |SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM cohort a
        |WHERE a.bal_cents * (SELECT count(*) FROM cohort WHERE bal_cents > 0)
        |   > (SELECT sum(bal_cents) FROM cohort WHERE bal_cents > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = a.c_custkey)
        |GROUP BY 1""".stripMargin,

    // q223: nested IN-subqueries with a correlated half-of-total
    // threshold — the Q20 silhouette on this schema.
    "q223_dominant_supplier" ->
      """WITH red AS (
        | SELECT l_partkey, l_suppkey, CAST(round(l_quantity) AS BIGINT) AS qty
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE year(l_shipdate) = 1996 AND contains(p_name, 'red'))
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        | SELECT l_suppkey FROM red a GROUP BY l_partkey, l_suppkey
        | HAVING sum(qty) * 2 > (SELECT sum(qty) FROM red b
        |   WHERE b.l_partkey = a.l_partkey))""".stripMargin,

    "q228_topk_other" ->
      """WITH daily AS (
        | SELECT epoch_ms(ts) // 86400000 AS day, event_type,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1, 2),
        |r AS (
        | SELECT day, event_type, cents, row_number() OVER (
        |   PARTITION BY day ORDER BY cents DESC, event_type) AS rk
        | FROM daily)
        |SELECT day, CASE WHEN rk <= 2 THEN event_type ELSE 'OTHER' END AS grp,
        | CAST(sum(cents) AS BIGINT) AS cents, count(*) AS n_types
        |FROM r GROUP BY 1, 2""".stripMargin,

    // q242: the textbook IN-subquery formulation.
    "q242_large_orders" ->
      """SELECT c_name, o_custkey, o_orderkey, o_orderdate,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
        | (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |   FROM lineitem WHERE l_orderkey = o_orderkey) AS total_qty
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey IN (
        | SELECT l_orderkey FROM lineitem GROUP BY 1
        | HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)""".stripMargin,

    // q243: the textbook view + scalar-max formulation, ties kept.
    "q243_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey, CAST(sum(CAST(round(
        |   l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
        |   AS BIGINT) AS total_rev_e4
        | FROM lineitem
        | WHERE year(l_shipdate) = 1996 AND month(l_shipdate) <= 3
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_e4
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)"""
        .stripMargin,

    // q247: the textbook WHERE-clause formulation.
    "q247_disjunct_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000)
        |    AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
        |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)"""
        .stripMargin,

    // q253: the unpruned three-way formulation — downward closure
    // guarantees the pruned plan returns the identical set.
    "q253_freq_triples" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
        |  FROM lineitem),
        |sized AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 200),
        |kept AS (SELECT bi.b, bi.i FROM bi JOIN sized USING (b))
        |SELECT x.i AS i1, y.i AS i2, z.i AS i3,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM kept x JOIN kept y ON x.b = y.b AND x.i < y.i
        | JOIN kept z ON x.b = z.b AND y.i < z.i
        |GROUP BY 1, 2, 3 HAVING count(*) >= 5""".stripMargin,

    // q316: the same star + ROLLUP.
    "q316_star_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS r_name,
        | coalesce(p_brand, '(all)') AS p_brand,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |   AS BIGINT)) AS BIGINT) AS rev_e4
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity <= 30
        |GROUP BY ROLLUP (r_name, p_brand)""".stripMargin,

    // q315: the same census quintile rule per dimension.
    "q315_rfm" ->
      """WITH rfm AS (
        | SELECT o_custkey,
        |  CAST(max(datediff('day', TIMESTAMP '1992-01-01', o_orderdate))
        |    AS BIGINT) AS r,
        |  CAST(count(*) AS BIGINT) AS f,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS m
        | FROM orders GROUP BY 1),
        |qr AS (SELECT r AS v, (sum(count(*)) OVER (ORDER BY r) - 1) * 5
        |  // (SELECT count(*) FROM rfm) + 1 AS q
        | FROM rfm GROUP BY r),
        |qf AS (SELECT f AS v, (sum(count(*)) OVER (ORDER BY f) - 1) * 5
        |  // (SELECT count(*) FROM rfm) + 1 AS q
        | FROM rfm GROUP BY f),
        |qm AS (SELECT m AS v, (sum(count(*)) OVER (ORDER BY m) - 1) * 5
        |  // (SELECT count(*) FROM rfm) + 1 AS q
        | FROM rfm GROUP BY m)
        |SELECT CAST(qr.q AS BIGINT) AS r_q, CAST(qf.q AS BIGINT) AS f_q,
        | CAST(qm.q AS BIGINT) AS m_q,
        | CAST(count(*) AS BIGINT) AS customers,
        | CAST(sum(rfm.m) AS BIGINT) AS cents
        |FROM rfm JOIN qr ON qr.v = rfm.r JOIN qf ON qf.v = rfm.f
        | JOIN qm ON qm.v = rfm.m
        |GROUP BY 1, 2, 3""".stripMargin,
  )
}
