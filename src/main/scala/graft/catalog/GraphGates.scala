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

/** Graph analytics: pagerank, components, triangles, centralities, k-core, motifs, process mining.
  *
  * 25 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object GraphGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Graph analytics: PageRank over the supplier co-occurrence graph
    // (suppliers sharing an order, both directions) — five power
    // iterations in BIGINT e9 fixed-point, so the oracle unrolls the
    // identical truncating arithmetic round by round.
    "q77_pagerank" -> ((s, dir) =>
      operators.Graph.pageRankE9(coSupplierPairs(s, dir), "l_suppkey",
        "dst_supp", iterations = 5)),

    // Graph analytics: per-node triangle counts with degree orientation
    // (Suri-Vassilvitskii) over the thresholded supplier co-occurrence
    // graph — ≥5 shared orders keeps the sf0.1 graph sparse enough that
    // the wedge step stays bounded while sf0.01 remains near-complete.
    "q85_triangles" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      operators.Graph.triangleCounts(pairs, "l_suppkey", "dst_supp")
    }),

    // Graph analytics: PERSONALIZED PageRank — teleport mass pinned to
    // the nation-0 suppliers, so rank measures proximity to that seed
    // set instead of global authority; the same e9 fixed-point rounds as
    // q77, oracled with a seed CASE in each unrolled round.
    "q87_ppr" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
      val seeds = t(s, dir, "supplier").where(col("s_nationkey") === 0)
        .select(col("s_suppkey"))
      operators.Graph.pageRankE9(pairs, "l_suppkey", "dst_supp",
        iterations = 5, seeds = Some(seeds), seedIdCol = "s_suppkey")
    }),

    // Graph analytics: exact-integer modularity of an LPA partition —
    // the evaluate step after community detection. Q·(2m)² decomposes as
    // Σ_c (4m·E_c − D_c²), all BIGINTs, so per-community contributions
    // hash-gate with no doubles anywhere. The raw co-occurrence graph is
    // structureless (LPA honestly collapses it to ONE community), so this
    // gate restricts edges to same-nation supplier pairs — block-diagonal
    // structure LPA must recover, one community row per block.
    "q86_modularity" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val pairs = coSupplierPairs(s, dir)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .withColumnRenamed("s_nationkey", "src_nation").drop("s_suppkey")
        .join(broadcast(sup), col("dst_supp") === col("s_suppkey"))
        .where(col("src_nation") === col("s_nationkey"))
        .select(col("l_suppkey"), col("dst_supp"))
      val labels = operators.Graph.labelPropagation(pairs, "l_suppkey",
        "dst_supp", iterations = 4)
      operators.Graph.modularityParts(pairs, "l_suppkey", "dst_supp",
        labels, "l_suppkey", "community")
    }),

    // Graph analytics: label-propagation communities over the same
    // supplier co-occurrence graph — synchronous rounds with the
    // (count DESC, label ASC) argmax, so the oracle unrolls the
    // identical update round by round. Distinct from components (q41):
    // density-based labels, not reachability.
    "q84_label_prop" -> ((s, dir) =>
      operators.Graph.labelPropagation(coSupplierPairs(s, dir), "l_suppkey",
        "dst_supp", iterations = 4)),

    // Bounded-round k-core peel over the part co-occurrence graph: two
    // synchronous drop-and-induce rounds at k=80 — a real cascade on this
    // data (round 2 removes nodes round 1 exposed). The dense-subgraph
    // extractor of graph cleaning.
    "q128_kcore" -> ((s, dir) => {
      // build undirected-distinct once and mirror (r15 optimization
      // round): the < self-join emits half the raw pair stream and the
      // distinct dedups before doubling — the peel's own distinct then
      // sees an already-unique set. Edge set identical to the previous
      // =!= build.
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val half = li.join(
          li.select(col("l_orderkey"), col("l_partkey").as("dst_part")),
          "l_orderkey")
        .where(col("l_partkey") < col("dst_part"))
        .select(col("l_partkey"), col("dst_part")).distinct()
      val co = half.unionByName(
        half.select(col("dst_part").as("l_partkey"),
          col("l_partkey").as("dst_part")))
      operators.Graph.kCorePeel(co, "l_partkey", "dst_part", k = 80,
        rounds = 2)
    }),

    // Bounded-depth BFS reachability from supplier 1 over the shared
    // co-occurrence edge set — frontier-proportional per-round work
    // (level-sync, anti-join vs visited), exact integer hops; the oracle
    // replays it as a depth-capped recursive CTE.
    "q180_bfs_hops" -> ((s, dir) =>
      Graph.bfsHops(coSupplierPairs(s, dir), "l_suppkey", "dst_supp",
        s.range(1, 2).select(col("id").as("l_suppkey")), "l_suppkey",
        maxHops = 3)),

    // Round-bounded Bellman-Ford SSSP on the same graph, edge cost =
    // 1e6 div multiplicity (heavier co-occurrence = cheaper hop): after
    // 2 rounds `cost` is exact over all ≤2-edge paths — a cheap 2-hop
    // detour legitimately beats a rare direct edge, which is the
    // semantics the oracle's depth-capped walk reproduces in integers.
    "q181_sssp" -> ((s, dir) =>
      Graph.boundedSssp(
        coSupplierPairs(s, dir)
          .groupBy(col("l_suppkey"), col("dst_supp"))
          .agg(expr("1000000 div count(1)").as("w")),
        "l_suppkey", "dst_supp", "w",
        s.range(1, 2).select(col("id").as("l_suppkey")), "l_suppkey",
        rounds = 2)),

    // Weighted PageRank over the co-occurrence multiset — multiplicity
    // as edge weight, (r·w) div W_u integer contributions, same shared
    // edge materialization as q77/q180.
    "q203_weighted_pagerank" -> ((s, dir) =>
      Graph.pageRankWeightedE9(
        coSupplierPairs(s, dir)
          .groupBy(col("l_suppkey"), col("dst_supp"))
          .agg(count(lit(1)).as("w")),
        "l_suppkey", "dst_supp", "w", iterations = 2)),

    // Degree-assortativity sufficient statistics over the distinct
    // co-occurrence edges — do hubs co-occur with hubs? Exact BIGINT
    // Pearson pieces, never a double.
    "q204_assortativity" -> ((s, dir) =>
      Graph.degreeAssortativityStats(
        coSupplierPairs(s, dir).distinct(), "l_suppkey", "dst_supp")),

    // Per-edge triangle support (the k-truss primitive) over the q85
    // thresholded co-supplier graph: each edge with the triangles it
    // closes, zero-support edges included.
    "q219_edge_support" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      operators.Graph.edgeSupport(pairs, "l_suppkey", "dst_supp")
    }),

    // Dominant principal direction of the embedding table: 6 rounds of
    // integer power iteration on the exact q138 Gram, max-norm
    // renormalization (no sqrt anywhere); the oracle unrolls every
    // round in HUGEINT.
    "q241_top_component" -> ((s, dir) =>
      operators.Similarity.powerIterationTopComponent(
        t(s, dir, "embeddings"), "embedding", rounds = 6)),

    // HITS hubs/authorities over the directed customer→supplier
    // purchase graph: mutual-reinforcement scoring (good buyers certify
    // good sellers) that the q77 random walk can't express; 4 rounds of
    // max-norm integer iteration, every round oracle-unrolled.
    "q244_hits" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"))
      operators.Graph.hitsE6(edges, "o_custkey", "l_suppkey",
        iterations = 4)
    }),

    // GraphSAGE-shape 2-hop neighborhood aggregation over the
    // co-supplier graph, feature = account balance cents: layer 2
    // re-aggregates layer-1 summaries instead of enumerating 2-hop
    // paths — the associativity trick that keeps k-hop features linear
    // in |E| per layer.
    "q257_two_hop_agg" -> ((s, dir) =>
      decStr(operators.Graph.twoHopAggregate(
        coSupplierPairs(s, dir), "l_suppkey", "dst_supp",
        t(s, dir, "supplier").select(col("s_suppkey"),
          cents(col("s_acctbal")).as("bal")),
        "s_suppkey", "bal"))),

    // Link prediction (graph family): resource-allocation index over the
    // top-4000-weight co-supplier edges — every non-adjacent distance-2
    // pair scored Σ 1e12 div deg(common neighbor) + common-neighbor
    // count; top 20 under a total order. Edge selection is top-K by
    // weight under the GlobalRank distributed row-number (a fixed
    // HAVING threshold is scale-brittle: it saturates small graphs to a
    // candidate-free clique and empties big ones), which is also the
    // hub gate the wedge budget needs. The "which suppliers will
    // co-occur next" readout a recommender bootstrap runs.
    "q296_link_predict" -> ((s, dir) => {
      val weighted = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w"))
      val top = operators.GlobalRank.withGlobalRowNumber(weighted,
          Seq(col("w").desc, col("l_suppkey"), col("dst_supp")), "rk")
        .where(col("rk") <= 4000)
        .select(col("l_suppkey"), col("dst_supp"))
      operators.Graph.linkPredictionRA(top, "l_suppkey", "dst_supp")
        .orderBy(col("ra_e12").desc, col("cn").desc, col("a"), col("b"))
        .limit(20)
    }),

    // Bounded-horizon betweenness centrality (Brandes 2001 with the two
    // production truncations made explicit: source pivots per
    // Brandes–Pich 2007 + the q180/q181 depth-horizon discipline) over
    // the q85-thresholded co-supplier graph — the brokerage centrality
    // completing degree/PageRank/HITS/k-core. Exact integer path counts
    // forward; dependencies e6-scaled BEFORE the sum with truncating
    // division backward, so the oracle unrolls all three BFS levels and
    // both accumulation steps bit-exactly. GraphSpec pins the sequential
    // integer-Brandes reference and horizon truncation.
    "q332_betweenness" -> ((s, dir) => {
      // eager checkpoint: the thresholded half-edge set feeds BOTH the
      // operator's edge frame and the seed set — without it the
      // 3.6M-row co-supplier groupBy ran twice, once under the seed
      // checkpoint and once under the edge persist (r16 probe: ~1.2 s
      // of the gate's wall was the duplicate build)
      val und = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
        .truncate(true)
      val edges = und.unionByName(und.select(
        col("dst_supp").as("l_suppkey"), col("l_suppkey").as("dst_supp")))
      val seeds = edges.select(col("l_suppkey").as("id")).distinct()
        .where(col("id") % 5 === 1)
      operators.Graph.betweennessE6(edges, "l_suppkey", "dst_supp",
        seeds, "id", maxDepth = 3)
    }),

    // Rich-club profile of the q85 thresholded co-supplier graph:
    // density among nodes with degree > k for k ∈ {2,4,8,16,32} — do
    // the hub suppliers form a club, the density-profile companion to
    // q203's assortativity correlation.
    "q386_rich_club" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      operators.Graph.richClubE6(pairs, "l_suppkey", "dst_supp",
        ks = Seq(2, 4, 8, 16, 32))
    }),

    // Pivot-sampled harmonic closeness over the q85 thresholded
    // co-supplier graph (8 lowest-id pivots, 6-hop horizon): which
    // suppliers sit nearest the network core — the per-node
    // centrality beside q332's betweenness.
    "q396_closeness" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      val piv = pairs.select(col("l_suppkey").as("id"))
        .unionByName(pairs.select(col("dst_supp").as("id")))
        .distinct().orderBy(col("id")).limit(8)
      operators.Graph.harmonicClosenessE6(pairs, "l_suppkey",
        "dst_supp", piv, "id", maxHops = 6)
    }),

    // Nominal assortativity of the co-supplier graph by nation: do
    // suppliers co-appear within their nation more than chance — the
    // categorical twin of q203, exact cleared-integer Newman r.
    "q410_attr_assortativity" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      decStr(operators.Graph.attributeAssortativityE6(pairs,
        "l_suppkey", "dst_supp",
        t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey").cast("long").as("nat")),
        "s_suppkey", "nat"))
    }),

    // Moran's I of supplier account balance over the q85 co-supplier
    // graph: do connected suppliers carry similar balances — numeric
    // graph autocorrelation beside q410's categorical mixing.
    "q412_morans_i" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      decStr(operators.Graph.moransIE6(pairs, "l_suppkey", "dst_supp",
        t(s, dir, "supplier").select(col("s_suppkey"),
          cents(col("s_acctbal")).as("bal")),
        "s_suppkey", "bal"))
    }),

    // Directly-follows conformance (van der Aalst process mining): the
    // observed event-type DFG per user vs the DECLARED process model —
    // per observed edge, traffic + legality + the source activity's
    // conforming share; off-model edges with real mass are the
    // production/process drift list. The q82 transition census with a
    // broadcast literal model on top.
    "q436_conformance" -> ((s, dir) =>
      operators.ProcessMining.dfgConformanceE6(ev(s, dir),
        col("user_id"), col("ts_ms"), col("event_id"), col("event_type"),
        model = Seq(
          ("view", "view"), ("view", "click"), ("view", "signup"),
          ("click", "view"), ("click", "purchase"),
          ("purchase", "view"), ("signup", "view")))),

    // Global transitivity + mean local clustering coefficient of the
    // q85 thresholded co-supplier graph — the small-world/cohesion
    // readout (3T/W and the Watts–Strogatz mean) beside q203/q204's
    // assortativity and q386's rich club.
    "q438_clustering_coeff" -> ((s, dir) => {
      val pairs = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      operators.Graph.clusteringCoefficientE6(pairs, "l_suppkey",
        "dst_supp")
    }),

    // Pivot-set eccentricity on the q85/q386 thresholded co-supplier
    // graph (8 smallest nodes, exact BFS each, one pivot-tagged
    // level-sync loop): max(ecc) is the standard diameter lower bound
    // (Magnien et al. 2009) — "how many hops across the supplier
    // network", the companion scale readout to q332's betweenness.
    "q428_eccentricity" -> ((s, dir) => {
      val und = coSupplierPairs(s, dir)
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
      val pairs = und.select(col("l_suppkey").as("u"), col("dst_supp").as("v"))
        .unionByName(und.select(col("dst_supp").as("u"),
          col("l_suppkey").as("v")))
      operators.Graph.eccentricityPivots(pairs, "u", "v",
        nPivots = 8, maxHops = 16)
    }),

    // Conductance of the nation partition over the co-supplier graph:
    // per nation, cut / min(vol, 2m − vol) in exact integers — the
    // boundary-leakage readout modularity (q86) can't see. The
    // partition is DECLARED (supplier → nation), so the oracle needs no
    // iterative replay.
    "q367_conductance" -> ((s, dir) =>
      operators.Graph.conductanceParts(coSupplierPairs(s, dir),
        "l_suppkey", "dst_supp",
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        "s_suppkey", "s_nationkey")),

    // Connected components the diameter-proof way: alternating
    // large-star/small-star contraction (Kiveris et al. 2014) over the
    // SAME mined near-dup pair graph q41 labels by propagation — the
    // O(log² n)-rounds scale path for 100 TB graphs whose components
    // are deep (propagation pays per hop; star contraction doesn't).
    // Identical output contract to q41, so the recursive-closure oracle
    // proves the two algorithms agree on real data; GraphSpec pins the
    // deep-path case (300-node chain) and brute-force/label-prop parity.
    "q328_cc_bigstar" -> ((s, dir) => {
      val comp = operators.Graph.alternatingComponents(
          minedDocPairs(s, dir), "a_id", "b_id")
        .withColumnRenamed("node", "doc_id")
      t(s, dir, "documents").select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          (col("component").isNull ||
            col("component") === col("doc_id")).as("is_canonical"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    "q77_pagerank" -> q77OracleSql,

    "q84_label_prop" -> q84OracleSql,

    "q85_triangles" -> q85OracleSql,

    "q86_modularity" -> q86OracleSql,

    "q87_ppr" -> q87OracleSql,

    // q128: two unrolled drop-and-induce rounds at k=80, then the
    // surviving subgraph's degrees.
    "q128_kcore" ->
      """WITH co AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |k1 AS (SELECT a FROM co GROUP BY a HAVING count(*) >= 80),
        |e1 AS (SELECT co.a, co.b FROM co
        |  JOIN k1 ka ON ka.a = co.a JOIN k1 kb ON kb.a = co.b),
        |k2 AS (SELECT a FROM e1 GROUP BY a HAVING count(*) >= 80),
        |e2 AS (SELECT e1.a, e1.b FROM e1
        |  JOIN k2 ka ON ka.a = e1.a JOIN k2 kb ON kb.a = e1.b)
        |SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM e2 GROUP BY a""".stripMargin,

    // q180: depth-capped recursive walk; UNION dedups (id, d) pairs so
    // the CTE stays ≤ nodes × (maxHops+1) rows.
    "q180_bfs_hops" ->
      """WITH RECURSIVE e AS (
        | SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        | FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        | WHERE a.l_suppkey <> b.l_suppkey),
        |walk(id, d) AS (
        | SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
        | UNION
        | SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.id
        | WHERE w.d < 3)
        |SELECT id AS l_suppkey, MIN(d) AS hops FROM walk GROUP BY 1""".stripMargin,

    // q181: same walk shape carrying integer path cost; 2-round bound
    // keeps the pre-dedup path census quadratic, not exponential.
    "q181_sssp" ->
      """WITH RECURSIVE e AS (
        | SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
        |   1000000 // count(*) AS w
        | FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        | WHERE a.l_suppkey <> b.l_suppkey GROUP BY 1, 2),
        |walk(id, cost, d) AS (
        | SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
        | UNION
        | SELECT e.dst, w.cost + e.w, w.d + 1 FROM walk w
        | JOIN e ON e.src = w.id WHERE w.d < 2)
        |SELECT id AS l_suppkey, CAST(MIN(cost) AS BIGINT) AS cost
        |FROM walk GROUP BY 1""".stripMargin,

    // q203: both weighted rounds unrolled — (r·w) // W_u contributions.
    "q203_weighted_pagerank" ->
      """WITH e AS (SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
        |  count(*) AS w
        | FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        | WHERE a.l_suppkey <> b.l_suppkey GROUP BY 1, 2),
        |ws AS (SELECT src, sum(w) AS ws FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.dst AS id, sum((r0.r * e.w) // ws.ws) AS m
        | FROM e JOIN ws ON ws.src = e.src JOIN r0 ON r0.id = e.src
        | GROUP BY 1),
        |r1 AS (SELECT n.id, CAST(150000000 + (85 * coalesce(c1.m, 0)) // 100
        |   AS BIGINT) AS r FROM nodes n LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.dst AS id, sum((r1.r * e.w) // ws.ws) AS m
        | FROM e JOIN ws ON ws.src = e.src JOIN r1 ON r1.id = e.src
        | GROUP BY 1),
        |r2 AS (SELECT n.id, CAST(150000000 + (85 * coalesce(c2.m, 0)) // 100
        |   AS BIGINT) AS r FROM nodes n LEFT JOIN c2 USING (id))
        |SELECT id AS l_suppkey, r AS rank_e9 FROM r2""".stripMargin,

    // q204: same censuses over DISTINCT edges, integer Pearson pieces.
    "q204_assortativity" ->
      """WITH e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        | FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        | WHERE a.l_suppkey <> b.l_suppkey),
        |od AS (SELECT src, count(*) AS x FROM e GROUP BY 1),
        |id_ AS (SELECT dst, count(*) AS y FROM e GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        | CAST(sum(x * y) AS BIGINT) AS sum_xy,
        | CAST(sum(x * x) AS BIGINT) AS sum_xx,
        | CAST(sum(y * y) AS BIGINT) AS sum_yy,
        | CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS corr_num,
        | CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS var_x,
        | CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS var_y
        |FROM e JOIN od USING (src) JOIN id_ ON id_.dst = e.dst""".stripMargin,

    // q219: q85's oriented-wedge CTEs, each triangle charged to its
    // three canonical edges, left join keeps support-0 edges.
    "q219_edge_support" ->
      """WITH raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |e AS (SELECT u AS a, v AS b FROM raw),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
        | FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |o AS (
        | SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS src,
        |        CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS dst,
        |        CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dd
        | FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
        |w AS (
        | SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
        | FROM o o1 JOIN o o2 ON o1.src = o2.src
        |  AND (o1.dd, o1.dst) < (o2.dd, o2.dst)),
        |tri AS (SELECT x, y, z FROM w JOIN o ON o.src = w.y AND o.dst = w.z),
        |te AS (
        | SELECT least(x, y) AS a, greatest(x, y) AS b FROM tri
        | UNION ALL SELECT least(x, z), greatest(x, z) FROM tri
        | UNION ALL SELECT least(y, z), greatest(y, z) FROM tri),
        |supp AS (SELECT a, b, CAST(count(*) AS BIGINT) AS support
        | FROM te GROUP BY 1, 2)
        |SELECT e.a AS l_suppkey, e.b AS dst_supp,
        | coalesce(supp.support, 0) AS support
        |FROM e LEFT JOIN supp ON supp.a = e.a AND supp.b = e.b""".stripMargin,

    "q241_top_component" -> q241OracleSql,

    "q244_hits" -> q244OracleSql,

    // q257: the two-layer re-aggregation unrolled.
    "q257_two_hop_agg" ->
      """WITH e AS (SELECT DISTINCT x.l_suppkey AS src, y.l_suppkey AS dst
        |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        |   AND x.l_suppkey <> y.l_suppkey),
        |f AS (SELECT s_suppkey AS id,
        |  CAST(round(s_acctbal*100) AS BIGINT) AS x FROM supplier),
        |h1 AS (SELECT src AS id, count(*) AS deg,
        |  sum(CAST(f.x AS HUGEINT)) AS sum1
        | FROM e JOIN f ON f.id = e.dst GROUP BY 1),
        |h2 AS (SELECT src AS id, sum(deg) AS n2, sum(sum1) AS sum2
        | FROM e JOIN h1 ON h1.id = e.dst GROUP BY 1)
        |SELECT h1.id AS id, CAST(deg AS BIGINT) AS deg,
        |  CAST(CAST(sum1 AS DECIMAL(38,0)) AS VARCHAR) AS sum1,
        |  CAST(coalesce(n2, 0) AS BIGINT) AS n2,
        |  CAST(CAST(coalesce(sum2, 0) AS DECIMAL(38,0)) AS VARCHAR) AS sum2
        |FROM h1 LEFT JOIN h2 ON h1.id = h2.id""".stripMargin,

    // q296: wedge/degree replay of linkPredictionRA over the top-4000
    // co-supplier edges (GlobalRank's total order as a window rank),
    // ANTI JOIN dropping adjacency.
    "q296_link_predict" ->
      """WITH raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v,
        |   count(*) AS w
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2),
        |e AS (SELECT u AS a, v AS b FROM (
        |  SELECT u, v, row_number() OVER (ORDER BY w DESC, u, v) AS rk
        |  FROM raw) WHERE rk <= 4000),
        |adj AS (SELECT a AS w, b AS n FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |wedge AS (
        | SELECT x.n AS a, y.n AS b, dg.d
        | FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
        | JOIN deg dg ON dg.w = x.w),
        |sc AS (
        | SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
        |   CAST(sum(1000000000000 // d) AS BIGINT) AS ra_e12
        | FROM wedge GROUP BY 1, 2),
        |cand AS (
        | SELECT sc.a, sc.b, sc.cn, sc.ra_e12 FROM sc
        | ANTI JOIN e ON e.a = sc.a AND e.b = sc.b)
        |SELECT a, b, cn, ra_e12 FROM cand
        |ORDER BY ra_e12 DESC, cn DESC, a, b LIMIT 20""".stripMargin,

    // q332: Brandes unrolled — 3 BFS levels (path-count sums, anti-joins
    // against reached), then both dependency accumulations with the
    // identical e6 truncating-division terms.
    "q332_betweenness" ->
      """WITH e0 AS (
        | SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        | FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        | WHERE a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |e AS (SELECT s1 AS src, s2 AS dst FROM e0
        |      UNION ALL SELECT s2, s1 FROM e0),
        |r0 AS (SELECT DISTINCT src AS s, src AS v, CAST(1 AS BIGINT) AS sigma
        |       FROM e WHERE src % 5 = 1),
        |c1 AS (SELECT l.s, e.dst AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM r0 l JOIN e ON e.src = l.v GROUP BY 1, 2),
        |r1 AS (SELECT c.s, c.v, c.sigma FROM c1 c
        |       LEFT JOIN r0 p ON p.s = c.s AND p.v = c.v WHERE p.v IS NULL),
        |c2 AS (SELECT l.s, e.dst AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM r1 l JOIN e ON e.src = l.v GROUP BY 1, 2),
        |r2 AS (SELECT c.s, c.v, c.sigma FROM c2 c
        |       LEFT JOIN r0 p0 ON p0.s = c.s AND p0.v = c.v
        |       LEFT JOIN r1 p1 ON p1.s = c.s AND p1.v = c.v
        |       WHERE p0.v IS NULL AND p1.v IS NULL),
        |c3 AS (SELECT l.s, e.dst AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
        |       FROM r2 l JOIN e ON e.src = l.v GROUP BY 1, 2),
        |r3 AS (SELECT c.s, c.v, c.sigma FROM c3 c
        |       LEFT JOIN r0 p0 ON p0.s = c.s AND p0.v = c.v
        |       LEFT JOIN r1 p1 ON p1.s = c.s AND p1.v = c.v
        |       LEFT JOIN r2 p2 ON p2.s = c.s AND p2.v = c.v
        |       WHERE p0.v IS NULL AND p1.v IS NULL AND p2.v IS NULL),
        |d2 AS (SELECT v2.s, v2.v,
        |        CAST(sum(v2.sigma * 1000000 // v3.sigma) AS BIGINT) AS delta
        |       FROM r2 v2 JOIN e ON e.src = v2.v
        |       JOIN r3 v3 ON v3.s = v2.s AND v3.v = e.dst
        |       GROUP BY 1, 2),
        |dd2 AS (SELECT r2.s, r2.v, r2.sigma,
        |        coalesce(d2.delta, 0) AS delta
        |        FROM r2 LEFT JOIN d2 ON d2.s = r2.s AND d2.v = r2.v),
        |d1 AS (SELECT v1.s, v1.v,
        |        CAST(sum(v1.sigma * (1000000 + w.delta) // w.sigma)
        |          AS BIGINT) AS delta
        |       FROM r1 v1 JOIN e ON e.src = v1.v
        |       JOIN dd2 w ON w.s = v1.s AND w.v = e.dst
        |       GROUP BY 1, 2),
        |dd1 AS (SELECT r1.s, r1.v, coalesce(d1.delta, 0) AS delta
        |        FROM r1 LEFT JOIN d1 ON d1.s = r1.s AND d1.v = r1.v)
        |SELECT v AS node, CAST(sum(delta) AS BIGINT) AS bc_e6
        |FROM (SELECT s, v, delta FROM dd1
        |      UNION ALL SELECT s, v, delta FROM dd2)
        |GROUP BY 1""".stripMargin,

    // q386: q85's thresholded edge CTE + per-k correlated counts.
    "q386_rich_club" ->
      """WITH raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
        | FROM (SELECT u AS id FROM raw UNION ALL SELECT v FROM raw)
        | GROUP BY 1),
        |ks AS (SELECT unnest([2, 4, 8, 16, 32]) AS k),
        |st AS (SELECT k,
        |  (SELECT count(*) FROM deg WHERE d > k) AS n_nodes,
        |  (SELECT count(*) FROM raw
        |    JOIN deg da ON da.id = raw.u JOIN deg db ON db.id = raw.v
        |    WHERE da.d > k AND db.d > k) AS n_edges
        | FROM ks)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n_nodes AS BIGINT) AS n_nodes,
        | CAST(n_edges AS BIGINT) AS n_edges,
        | CASE WHEN n_nodes >= 2 THEN
        |  CAST(2 * CAST(n_edges AS HUGEINT) * 1000000
        |   // (CAST(n_nodes AS HUGEINT) * (n_nodes - 1)) AS BIGINT)
        | END AS phi_e6
        |FROM st""".stripMargin,

    // q436: the q82 lead() census + a VALUES model, window shares.
    "q436_conformance" ->
      """WITH p AS (SELECT event_type AS a,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts), event_id) AS next
        | FROM events),
        |c AS (SELECT a AS from_act, next AS to_act,
        |  CAST(count(*) AS BIGINT) AS n FROM p
        | WHERE next IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT * FROM (VALUES
        |  ('view','view'), ('view','click'), ('view','signup'),
        |  ('click','view'), ('click','purchase'),
        |  ('purchase','view'), ('signup','view')) AS t(mf, mt)),
        |f AS (SELECT from_act, to_act, n, (mf IS NOT NULL) AS allowed
        | FROM c LEFT JOIN m ON m.mf = c.from_act AND m.mt = c.to_act),
        |w AS (SELECT *,
        |  CAST(sum(n) OVER (PARTITION BY from_act) AS BIGINT)
        |   AS from_total,
        |  CAST(sum(CASE WHEN allowed THEN n ELSE 0 END)
        |    OVER (PARTITION BY from_act) AS BIGINT) AS conf
        | FROM f)
        |SELECT from_act, to_act, n, allowed, from_total,
        | CAST(n * 1000000 // from_total AS BIGINT) AS share_of_from_e6,
        | CAST(conf * 1000000 // from_total AS BIGINT)
        |  AS conforming_of_from_e6
        |FROM w""".stripMargin,

    // q438: canonical a<b edges, a<b<c triangle join, corner census,
    // degree-census wedge arithmetic, per-node truncation before the
    // local-CC mean.
    "q438_clustering_coeff" ->
      """WITH und AS (
        | SELECT a.l_suppkey AS a, b.l_suppkey AS b
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
        | FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        | GROUP BY 1),
        |tri AS (SELECT ab.a AS x, ab.b AS y, bc.b AS z
        | FROM und ab JOIN und bc ON bc.a = ab.b
        | JOIN und ac ON ac.a = ab.a AND ac.b = bc.b),
        |corners AS (SELECT id, CAST(count(*) AS BIGINT) AS t
        | FROM (SELECT unnest([x, y, z]) AS id FROM tri) GROUP BY 1),
        |pn AS (SELECT deg.id, deg.d, coalesce(corners.t, 0) AS t,
        |  (deg.d * (deg.d - 1)) // 2 AS w
        | FROM deg LEFT JOIN corners ON corners.id = deg.id),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(w) AS BIGINT) AS wedges,
        |  CAST(sum(t) AS BIGINT) AS triangle_corners,
        |  CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_cc_nodes,
        |  CAST(sum(CASE WHEN d >= 2
        |    THEN CAST(t AS HUGEINT) * 1000000 // w ELSE 0 END)
        |   AS HUGEINT) AS lcc
        | FROM pn)
        |SELECT n_nodes, n_edges, wedges, triangle_corners,
        | CASE WHEN wedges > 0 THEN
        |  CAST(CAST(triangle_corners AS HUGEINT) * 1000000 // wedges
        |   AS BIGINT) END AS transitivity_e6,
        | n_cc_nodes,
        | CASE WHEN n_cc_nodes > 0 THEN
        |  CAST(lcc // n_cc_nodes AS BIGINT) END AS mean_local_cc_e6
        |FROM agg, ne""".stripMargin,

    // q428: recursive-CTE BFS (UNION dedups; min-hops per (p, id)),
    // over the q386 thresholded graph symmetrized.
    "q428_eccentricity" ->
      """WITH RECURSIVE und AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |e AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
        |pv AS (SELECT u AS p FROM (SELECT DISTINCT u FROM e)
        | ORDER BY p LIMIT 8),
        |walk(p, id, hops) AS (
        | SELECT p, p, 0 FROM pv
        | UNION
        | SELECT w.p, e.v, w.hops + 1 FROM walk w JOIN e ON e.u = w.id
        | WHERE w.hops < 16),
        |d AS (SELECT p, id, min(hops) AS h FROM walk GROUP BY 1, 2)
        |SELECT p AS pivot, CAST(max(h) AS BIGINT) AS ecc,
        | CAST(count(*) AS BIGINT) AS n_reached
        |FROM d GROUP BY 1""".stripMargin,

    // q412: cleared centering z′ = n·x − S (the n² cancels in the
    // ratio); cross term over symmetrized edges in HUGEINT.
    "q412_morans_i" ->
      """WITH raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |nodes AS (SELECT DISTINCT id FROM
        | (SELECT u AS id FROM raw UNION ALL SELECT v FROM raw)),
        |vals AS (SELECT s_suppkey AS id,
        |  CAST(round(s_acctbal * 100) AS BIGINT) AS x FROM supplier),
        |nv AS (SELECT nodes.id, vals.x FROM nodes
        | JOIN vals USING (id)),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS s FROM nv),
        |z AS (SELECT id, CAST(n AS HUGEINT) * x - s AS z, n
        | FROM nv, st),
        |ssq AS (SELECT max(n) AS n,
        |  coalesce(sum(z * z), CAST(0 AS HUGEINT)) AS sum_z2 FROM z),
        |dir AS (SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw),
        |cr AS (SELECT CAST(count(*) AS BIGINT) AS m_directed,
        |  coalesce(sum(a.z * b.z), CAST(0 AS HUGEINT)) AS cross_zz
        | FROM dir JOIN z a ON a.id = dir.u JOIN z b ON b.id = dir.v)
        |SELECT n AS n_nodes, m_directed,
        | CAST(CAST(cross_zz AS DECIMAL(38,0)) AS VARCHAR) AS cross_zz,
        | CAST(CAST(sum_z2 AS DECIMAL(38,0)) AS VARCHAR) AS sum_z2,
        | CASE WHEN m_directed * sum_z2 > 0 THEN
        |  CAST(CAST(n AS HUGEINT) * cross_zz * 1000000
        |   // (m_directed * sum_z2) AS BIGINT) END AS moran_i_e6,
        | CASE WHEN n > 1 THEN -(1000000 // (n - 1)) END AS e_null_e6
        |FROM ssq, cr""".stripMargin,

    // q410: symmetrized edge tagging, cleared Newman r in HUGEINT,
    // toward-zero for disassortative (negative) mixing.
    "q410_attr_assortativity" ->
      """WITH raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |dir AS (SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw),
        |att AS (SELECT s_suppkey AS nn, CAST(s_nationkey AS BIGINT)
        |  AS aa FROM supplier),
        |tg AS (SELECT x.aa AS au, y.aa AS av FROM dir
        | JOIN att x ON x.nn = dir.u JOIN att y ON y.nn = dir.v),
        |ea AS (SELECT CAST(count(*) AS BIGINT) AS m_directed,
        |  CAST(sum(CASE WHEN au = av THEN 1 ELSE 0 END) AS BIGINT)
        |   AS same_attr FROM tg),
        |rw AS (SELECT coalesce(sum(CAST(rr AS HUGEINT) * rr),
        |  CAST(0 AS HUGEINT)) AS sum_row2
        | FROM (SELECT au, count(*) AS rr FROM tg GROUP BY 1))
        |SELECT m_directed, same_attr,
        | CAST(CAST(sum_row2 AS DECIMAL(38,0)) AS VARCHAR) AS sum_row2,
        | CASE WHEN CAST(m_directed AS HUGEINT) * m_directed - sum_row2
        |   > 0 THEN
        |  CAST((CAST(same_attr AS HUGEINT) * m_directed - sum_row2)
        |   * 1000000
        |   // (CAST(m_directed AS HUGEINT) * m_directed - sum_row2)
        |   AS BIGINT) END AS r_e6
        |FROM ea, rw""".stripMargin,

    // q396: labeled multi-source BFS as a recursive CTE (UNION
    // dedups, min(hops) recovers first-visit), then Σ 1e6 // hops.
    "q396_closeness" ->
      """WITH RECURSIVE raw AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2 HAVING count(*) >= 5),
        |e AS (SELECT u AS src, v AS dst FROM raw
        | UNION SELECT v, u FROM raw),
        |nodes AS (SELECT DISTINCT src AS id FROM e),
        |piv AS (SELECT id AS p FROM nodes ORDER BY id LIMIT 8),
        |walk(p, id, hops) AS (
        | SELECT p, p, 0 FROM piv
        | UNION
        | SELECT w.p, e.dst, w.hops + 1 FROM walk w
        |  JOIN e ON e.src = w.id WHERE w.hops < 6),
        |md AS (SELECT p, id, min(hops) AS hops FROM walk GROUP BY 1, 2)
        |SELECT id AS l_suppkey, CAST(count(*) AS BIGINT)
        |  AS n_pivots_reached,
        | CAST(sum(1000000 // hops) AS BIGINT) AS harmonic_e6
        |FROM md WHERE hops > 0 GROUP BY 1""".stripMargin,

    // q367: canonical distinct edges → endpoint-label join → part-grain
    // census; cross-part edges charged to both sides.
    "q367_conductance" ->
      """WITH pairs AS (SELECT DISTINCT a.l_suppkey AS src,
        |  b.l_suppkey AS dst
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst)
        |   AS b FROM pairs),
        |lab AS (SELECT s_suppkey AS node, s_nationkey AS lab
        | FROM supplier),
        |ends AS (SELECT a, b, a AS node FROM e
        |         UNION ALL SELECT a, b, b AS node FROM e),
        |el AS (SELECT en.a, en.b, en.node, l.lab FROM ends en
        | JOIN lab l ON l.node = en.node),
        |vol AS (SELECT lab AS community,
        |  CAST(count(DISTINCT node) AS BIGINT) AS nodes,
        |  CAST(count(*) AS BIGINT) AS volume FROM el GROUP BY 1),
        |pe AS (SELECT a, b, min(lab) AS ca, max(lab) AS cb FROM el
        | GROUP BY 1, 2),
        |ie AS (SELECT ca AS community,
        |  CAST(count(*) AS BIGINT) AS internal_edges FROM pe
        | WHERE ca = cb GROUP BY 1),
        |ce AS (SELECT community, CAST(count(*) AS BIGINT) AS cut_edges
        | FROM (SELECT ca AS community FROM pe WHERE ca <> cb
        |       UNION ALL SELECT cb FROM pe WHERE ca <> cb)
        | GROUP BY 1),
        |mm AS (SELECT CAST(count(*) * 2 AS BIGINT) AS vt FROM e)
        |SELECT v.community, v.nodes, v.volume,
        | coalesce(ie.internal_edges, 0) AS internal_edges,
        | coalesce(ce.cut_edges, 0) AS cut_edges,
        | CASE WHEN least(v.volume, mm.vt - v.volume) = 0 THEN NULL
        |  ELSE CAST(CAST(coalesce(ce.cut_edges, 0) AS HUGEINT) * 1000000
        |   // least(v.volume, mm.vt - v.volume) AS BIGINT) END
        |  AS conductance_e6
        |FROM vol v LEFT JOIN ie USING (community)
        | LEFT JOIN ce USING (community) CROSS JOIN mm""".stripMargin,

    // q328: q41's recursive-closure truth — algorithm-independent, so
    // the star-contraction result must match it exactly.
    "q328_cc_bigstar" ->
      s"""WITH RECURSIVE $componentCtesSql
         |SELECT d.doc_id,
         | coalesce(c.component, d.doc_id) AS component,
         | (c.component IS NULL OR c.component = d.doc_id) AS is_canonical
         |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""".stripMargin,
  )
}
