package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations the 100 TB design relies on
  * must actually appear in the plans Catalyst produces — filter pushdown
  * to parquet, column pruning, broadcast of dimension tables, map-side
  * partial aggregation, and single-shuffle window resolution.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filters push down to the parquet scan") {
    val p = formatted("q09_asof_join")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]") ||
      p.contains("EqualTo(event_type,purchase)"), p.take(2000))
  }

  test("column pruning reaches the scan (narrow ReadSchema)") {
    val p = formatted("q14_last_seen")
    // only user_id, event_type, ts should be read — not value/props
    assert(!p.contains("props"), p.take(2000))
    assert(!p.contains("value"), p.take(2000))
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q02_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("aggregations are partial (map-side combine before the exchange)") {
    val p = plan("q01_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // partial aggregate appears below (after in text) the exchange
    assert(p.lastIndexOf("HashAggregate") > exchange, p.take(2000))
  }

  test("banded near-dup blocks with a hash join — never a cartesian product") {
    val p = plan("q27_embed_neardup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("similarity top-k broadcasts the query side") {
    val p = plan("q20_knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("as-of union resolves in one window pass (single sort per key)") {
    val p = plan("q09_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(2000))
  }

  test("latest-impressions exclusion runs on equi joins — never a cross product") {
    val p = plan("q32_latest_impressions")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("merge-details is equi-joins only; drop tracking adds no extra scan") {
    val p = plan("q39_merge_details")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("flagship chain is equi/range joins + FMGWS — never a cross product") {
    val p = plan("q35_flat_chain")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("counter job caches one projected scan for all families") {
    val p = plan("q36_counter_all")
    // families read the persisted projection, not the parquet file, so the
    // raw scan appears at most once in the final plan
    assert(p.contains("InMemoryTableScan"), p.take(2000))
  }

  test("PQ ANN: kernel encode + broadcast LUTs + partial top-k pushdown") {
    val p = plan("q52_pq_ann")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // corpus side: ONE kernel-encode projection; query side broadcast
    assert("pq_encode".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    // rank<=k prunes per-partition BEFORE the exchange (WindowGroupLimit
    // partial) — the top-k never shuffles the full pair set
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("semDedup: broadcast assignment, equi pair join, one cached assignment scan") {
    val p = plan("q58_sem_dedup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // centroid assignment broadcasts the (k)-row centroid side only; the
    // within-cluster ε-pair join is an equi join keyed on the cluster id
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    // both pair-join sides and the output read the persisted assignment,
    // not a recomputed scan+assignment subtree
    assert(p.contains("InMemoryTableScan"), p.take(2000))
  }

  test("heavy-hitters verify pass: broadcast candidates, no wide shuffle") {
    // returned frame is pass 2 — the exact count must semi-filter via a
    // broadcast hash join (≤k candidates) so the exchange never carries
    // the column's full cardinality
    val p = plan("q88_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("funnel stages join on the user key only — never a cross product") {
    val p = plan("q64_funnel")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("gap fill explodes per-key spans — no calendar cross join") {
    val p = plan("q67_gap_fill")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000)) // the sequence explode
  }

  test("incremental read prunes the base scan to touched partitions") {
    val p = plan("q51_upsert_incremental")
    // changed keys reach the full-history scan as a broadcast semi join,
    // and the base file scan carries a non-empty partition filter (only
    // dirs the new commits touched are listed)
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("PartitionFilters: [("), p.take(3000))
  }

  test("tf/df keyword top-k pushes WindowGroupLimit below the rank exchange") {
    val p = plan("q119_tfdf_keywords")
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    // partial mode appears before the final: map tasks keep local top-k
    // heaps, so the exchange never carries a doc's full term list
    assert(p.indexOf("WindowGroupLimit") != p.lastIndexOf("WindowGroupLimit"),
      p.take(3000))
  }

  test("equi-depth assignment is literal codegen — no join, no extra exchange") {
    val df = SparkEntry.queries("q113_equi_depth")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the returned plan is scan → project(bucket literals) → one agg
    // exchange; a join-based assignment would show Broadcast/SortMerge
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("sliding heavy hitters verify via broadcast candidates, summaries through the window exchange") {
    val p = plan("q112_sliding_heavy")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("triplet mining: anchors broadcast, two-branch rank keeps WindowGroupLimit") {
    val p = plan("q120_triplet_mining")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("join-size estimator never executes the join it predicts") {
    val df = SparkEntry.queries("q114_join_size")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only join is count-frame vs count-frame (post-aggregation);
    // both join children must be aggregates, not raw scans
    val smj = p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin")
    assert(smj, p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000)) // top-k, no global sort
  }

  test("gram matrix builds pair terms in-row: no self-join, no cartesian") {
    val p = plan("q138_gram_matrix")
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // the nested-transform explode
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("exact AUC never sorts raw rows — rank math rides the histogram") {
    val df = SparkEntry.queries("q140_auc")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only Sort allowed is the single-partition window over the
    // |distinct scores| histogram — the deepest plan node (printed last)
    // must be an aggregation of the raw scan, BELOW every Sort
    assert(p.contains("Window"), p.take(3000))
    assert(p.lastIndexOf("HashAggregate") > p.lastIndexOf("Sort "),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("int8 quantization broadcasts the stats row — encode is map-only") {
    val p = plan("q150_int8_quant")
    // pass 1: d-key census partially aggregated before its exchange;
    // pass 2: ONE broadcast of the folded stats row, no row-side shuffle
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(p.contains("partial_min"), p.take(3000))
    // the vector side joins the broadcast stats without exchanging itself
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("skyline windows ride the cell census, never the raw rows") {
    val p = plan("q146_doc_skyline")
    // census (partial_count before exchange) BELOW both window minima
    val firstWindow = p.indexOf("Window")
    assert(firstWindow >= 0 && p.contains("partial_count"), p.take(3000))
    assert(p.lastIndexOf("HashAggregate") > firstWindow, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("tfidf pair join keys on the term — df prune sits below it") {
    val p = plan("q155_tfidf_cosine")
    // the df census filter (2..maxDf) must prune postings BEFORE the
    // pair self-join; no cross product anywhere
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("Q9-shape star: dimensions broadcast, only the fact pair shuffles") {
    val p = plan("q165_profit")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    val shuffled = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"expected 3 broadcast dims:\n${p.take(2000)}")
    assert(shuffled <= 1, s"only lineitem-orders may shuffle:\n${p.take(2000)}")
  }

  test("whole-stage codegen covers the relational pipeline") {
    // AQE finalizes the plan (and its codegen annotation) only when THIS
    // query execution runs — collect() on the frame itself, not count()
    val df = SparkEntry.queries("q04_hourly_metrics")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the final plan
    assert(p.contains("isFinalPlan=true") && p.contains("*("), p.take(2000))
  }

  test("k-means assignment broadcasts centroids — the corpus never shuffles to meet them") {
    val p = plan("q183_kmeans")
    // the k-row centroid side arrives broadcast (nested-loop on the
    // unconditioned cross of corpus × k centroids); any SortMergeJoin
    // here would mean the whole corpus shuffled per Lloyd round
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("sequence-pair support joins on the user key — never a cross product") {
    val p = plan("q188_seq_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // exactly ONE nested-loop join: the broadcast of the 1-row totals
    // frame; the event self-join itself must be an equi join on the key
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") == 1, p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("temporal dimension join is an equi join on the key with the interval as post-filter") {
    val p = plan("q192_temporal_dim_join")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("bucketed aggregation runs with NO exchange — scan partitioning feeds the agg") {
    val df = SparkEntry.queries("q208_bucketed_agg")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("Bucketed: true"), p.take(2000))
    SparkEntry.cleanupQueryTmp()
  }

  test("JSON ingestion parses in one pass — no shuffle before the census aggregation") {
    val df = SparkEntry.queries("q193_json_ingest")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // exactly one exchange: the final per-lang aggregation
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      p.take(2000))
  }

  test("Q17-shape correlated threshold: part filter broadcast, no cartesian") {
    val p = plan("q220_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("Q21-shape waiting supplier: one orderkey shuffle family, supplier dim broadcast") {
    val p = plan("q221_waiting_supplier")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the supplier name attach must be a broadcast, not another shuffle
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("Q22-shape idle-rich: anti join present, scalar threshold broadcast") {
    val p = plan("q222_idle_rich_customers")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("Q20-shape dominant supplier: semi join into supplier is broadcast") {
    val p = plan("q223_dominant_supplier")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("null-aware NOT IN plans as a broadcast anti join, no cartesian") {
    val p = plan("q256_notin_nullaware")
    assert(p.contains("LeftAnti"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("q327 join elimination fires on the real gate plan (no joins left)") {
    val df = SparkEntry.queries("q327_join_elim")(spark, dir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, df.queryExecution.optimizedPlan.toString.take(4000))
    // and the physical plan reads ONLY lineitem
    val p = plan("q327_join_elim")
    assert(!p.contains("orders.parquet") && !p.contains("supplier.parquet"),
      p.take(4000))
  }

  test("q331 distinct elimination: one Aggregate (the rollup), not two") {
    val df = SparkEntry.queries("q331_distinct_elim")(spark, dir)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, df.queryExecution.optimizedPlan.toString.take(4000))
  }

  test("Q19-shape disjunction: per-side residuals reach the scans, part broadcasts") {
    val p = formatted("q247_disjunct_revenue")
    // the brand/size disjunction is extractable from the OR-of-ANDs and
    // must reach the part parquet scan as a pushed Or filter
    assert(p.contains("And(EqualTo(p_brand,Brand#12),LessThanOrEqual(p_size,5))"),
      p.take(4000))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("chrF gram censuses shuffle gram keys — never a cartesian pair join") {
    val p = plan("q459_chrf")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // map-side partial aggregation on the gram censuses
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(3000))
  }

  test("temperature mixture stays domain-grain: one scalar broadcast, no sort") {
    val p = plan("q460_temperature_mixture")
    // the totals frame joins back via broadcast (crossJoin of a 1-row agg)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("GAE is window-only: no join anywhere in the plan") {
    val p = plan("q461_gae")
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    // per-trajectory partitions, not a global single-partition window
    assert(p.contains("hashpartitioning"), p.take(3000))
  }
}

