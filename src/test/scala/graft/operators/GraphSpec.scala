package graft.operators

import graft.SparkSpec

/** Integer-fixed-point PageRank must match a sequential reference doing
  * the identical truncating arithmetic, handle dangling nodes, and be
  * invariant to partitioning and iteration-over-iteration deterministic. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 1→3, 2→3, 3→1, 4→3 (4 is a source; no one links to 4;
  // 4 has out-edges, 3 is the authority)
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))

  private def reference(iters: Int,
      seedSet: Option[Set[Long]] = None): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    def isSeed(n: Long) = seedSet.forall(_.contains(n))
    var r = nodes.map(n => n -> (if (isSeed(n)) 1000000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map(e => r(e._1) / deg(e._1)).sum
      }
      r = nodes.map(n => n -> ((if (isSeed(n)) 150000000L else 0L) +
        (85L * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    r
  }

  test("ranks match the sequential truncating-arithmetic reference") {
    for (iters <- Seq(1, 5)) {
      val got = Graph.pageRankE9(edges.toDF("s", "d"), "s", "d", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(iters), s"diverged at $iters iterations")
    }
    // 2 only ever receives half of 1's mass → weakest non-source; 1 and 3
    // trade the full circuit (3's sole out-edge feeds 1, so 1 edges ahead)
    val r5 = reference(5)
    assert(r5(1L) > r5(3L) && r5(3L) > r5(2L) && r5(2L) > r5(4L),
      s"rank ordering wrong: $r5")
    // node 4 has no in-edges: exactly the base term
    assert(r5(4L) == 150000000L)
  }

  test("personalized PageRank: teleport mass pinned to the seed set") {
    val seeds = Seq(Tuple1(1L)).toDF("sid")
    val got = Graph.pageRankE9(edges.toDF("s", "d"), "s", "d", 5,
        seeds = Some(seeds), seedIdCol = "sid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(5, Some(Set(1L))), s"diverged: $got")
    // the seed outranks everything; node 4 (unreachable from 1) holds zero
    assert(got(4L) == 0L && got.values.max == got(1L), s"shape wrong: $got")
    // seeding EVERY node degenerates to global PageRank exactly
    val allSeeds = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(Tuple1(_)).toDF("sid")
    val global = Graph.pageRankE9(edges.toDF("s", "d"), "s", "d", 3)
      .orderBy("s").collect().toSeq
    assert(Graph.pageRankE9(edges.toDF("s", "d"), "s", "d", 3,
      seeds = Some(allSeeds), seedIdCol = "sid").orderBy("s").collect().toSeq
      == global)
  }

  test("partition-invariant; duplicate edges collapse") {
    val dup = (edges ++ edges).toDF("s", "d")
    def run(parts: Int) = Graph
      .pageRankE9(dup.repartition(parts), "s", "d", 3)
      .orderBy("s").collect().toSeq
    assert(run(1) == run(9))
    assert(run(9) == Graph.pageRankE9(edges.toDF("s", "d"), "s", "d", 3)
      .orderBy("s").collect().toSeq)
  }

  // ---- label propagation ----

  // two triangles {1,2,3} and {4,5,6} bridged by 3–4, undirected
  // (both directions materialized, as the co-occurrence graph builds them)
  private val triangles: Seq[(Long, Long)] = {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    und ++ und.map(_.swap)
  }

  private def lpaReference(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val byDst = es.distinct.groupBy(_._2)
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val prev = lab
      lab = nodes.map { n =>
        byDst.get(n) match {
          case None => n -> prev(n)
          case Some(in) =>
            val cnts = in.groupBy(e => prev(e._1)).map { case (l, xs) => (l, xs.size) }
            n -> cnts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }.toMap
    }
    lab
  }

  test("label propagation matches the sequential synchronous reference") {
    for (iters <- Seq(1, 2, 4)) {
      val got = Graph.labelPropagation(triangles.toDF("s", "d"), "s", "d", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == lpaReference(triangles, iters), s"diverged at $iters rounds")
    }
    // after 4 rounds the bridge has NOT merged the triangles: density wins
    // (each triangle hears its own label twice, the bridge label once)
    val r4 = lpaReference(triangles, 4)
    assert(Set(1L, 2L, 3L).map(r4) == Set(1L) &&
      Set(4L, 5L, 6L).map(r4) == Set(3L), s"communities wrong: $r4")
  }

  test("label propagation: no-in-edge nodes keep labels; partition-invariant") {
    // 10→1 only: 10 never hears a label and must keep its own
    val withSource = triangles :+ (10L, 1L)
    val got = Graph.labelPropagation(withSource.toDF("s", "d"), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 10L)
    assert(got == lpaReference(withSource, 3))
    val dup = (triangles ++ triangles).toDF("s", "d")
    def run(parts: Int) = Graph
      .labelPropagation(dup.repartition(parts), "s", "d", 4)
      .orderBy("s").collect().toSeq
    assert(run(1) == run(9))
    assert(run(9) == Graph.labelPropagation(triangles.toDF("s", "d"), "s", "d", 4)
      .orderBy("s").collect().toSeq)
  }

  // ---- modularity ----

  test("modularity parts are exact integers matching hand computation") {
    // two triangles bridged by 3–4 (m = 7 canonical edges), labeled with
    // the 4-round LPA result {1,2,3}→1, {4,5,6}→3:
    //   community 1: E=3, D=2+2+3=7 → 4·7·3 − 49 = 35
    //   community 3: E=3, D=3+2+2=7 → 35
    // positive q_num both sides — the partition beats chance
    val labels = Graph.labelPropagation(triangles.toDF("s", "d"), "s", "d", 4)
    val got = Graph.modularityParts(triangles.toDF("s", "d"), "s", "d",
        labels, "s", "community")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((3L, 7L, 3L, 35L)), 3L -> ((3L, 7L, 3L, 35L))),
      s"got $got")
    // degenerate one-community partition: Q·(2m)² = 4m·m − (2m)² = 0
    val one = triangles.map(_._1).distinct.map(n => (n, 0L))
      .toDF("id", "community")
    val all = Graph.modularityParts(triangles.toDF("s", "d"), "s", "d",
        one, "id", "community")
      .collect().map(r => r.getLong(4))
    assert(all.toSeq == Seq(0L), s"one-community q_num should be 0: ${all.toSeq}")
  }

  // ---- conductance ----

  test("conductance of the two-triangle split charges the bridge to both sides") {
    // partition {1,2,3} / {4,5,6}: vol = 7 each, 2m = 14, cut = 1 (the
    // 3–4 bridge) → φ·1e6 = 1e6 div 7 = 142857 on both sides.
    val labels = triangles.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => (n, if (n <= 3L) 10L else 20L)).toDF("id", "part")
    val got = Graph.conductanceParts(triangles.toDF("s", "d"), "s", "d",
        labels, "id", "part")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got == Map(
      10L -> ((3L, 7L, 3L, 1L, 142857L)),
      20L -> ((3L, 7L, 3L, 1L, 142857L))), s"got $got")
    // everything-in-one-part: no boundary → NULL conductance
    val one = triangles.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => (n, 0L)).toDF("id", "part")
    val all = Graph.conductanceParts(triangles.toDF("s", "d"), "s", "d",
      one, "id", "part").collect()
    assert(all.length == 1 && all.head.getLong(4) == 0L &&
      all.head.isNullAt(5))
  }

  // ---- triangle counting ----

  private def bruteTriangles(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = es.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).distinct
    val adj = und.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val nodes = und.map(_._1).distinct
    nodes.map { n =>
      val nb = adj(n).toSeq
      n -> nb.combinations(2).count(p => adj(p(0)).contains(p(1))).toLong
    }.toMap
  }

  test("triangle counts match brute force; K4, pendant, and star cases") {
    // K4 on {1,2,3,4} (3 triangles per corner), pendant 5–1 (zero), and a
    // star hub 6 touching every K4 corner (hub in C(4,2) minus non-edges)
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (6L, 1L), (6L, 2L), (6L, 3L), (6L, 4L))
    val got = Graph.triangleCounts(es.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteTriangles(es), s"got $got")
    assert(got(5L) == 0L) // pendant closes nothing
    // a pure star has no triangles at all
    val star = (2L to 9L).map(l => (1L, l))
    val starGot = Graph.triangleCounts(star.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starGot.values.forall(_ == 0L), s"star produced $starGot")
  }

  test("triangle counts: direction/duplicate-insensitive, partition-invariant") {
    val seeded = new scala.util.Random(7)
    val rand = (for (_ <- 1 to 60)
      yield (seeded.nextInt(12).toLong, seeded.nextInt(12).toLong))
      .filter(e => e._1 != e._2)
    val noisy = rand ++ rand.map(_.swap) ++ rand // dups + both directions
    def run(parts: Int) = Graph
      .triangleCounts(noisy.toDF("s", "d").repartition(parts), "s", "d")
      .orderBy("s").collect().toSeq.map(r => r.getLong(0) -> r.getLong(1))
    assert(run(1) == run(9))
    assert(run(9).toMap == bruteTriangles(rand))
  }

  test("kCorePeel: synchronous drop-and-induce rounds match a model, cascade included") {
    // pentagon 1-2-3-4-5 plus a tail 5-6: k=2 peel round 1 drops 6
    // (deg 1); round 2 then drops 5 (its degree FELL to 2? no — 5 keeps
    // edges to 1 and 4 → deg 2, stays). Fixpoint = the pentagon.
    val penta = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (5L, 6L))
    val both = penta ++ penta.map(_.swap)
    val got = Graph.kCorePeel(both.toDF("a", "b"), "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))

    // chain 1-2-3-4: k=2 cascades — round 1 drops endpoints 1,4; round 2
    // drops the newly-exposed 2,3; empty at the fixpoint
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val chainBoth = chain ++ chain.map(_.swap)
    val r1 = Graph.kCorePeel(chainBoth.toDF("a", "b"), "a", "b", 2, 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(r1 == Set(2L, 3L), "round 1 keeps the middle (degrees computed pre-drop)")
    val r2 = Graph.kCorePeel(chainBoth.toDF("a", "b"), "a", "b", 2, 2)
      .collect()
    assert(r2.isEmpty, "round 2 must see the cascaded degree drop")

    // randomized parity vs a reference model across partitionings
    val rnd = new scala.util.Random(3)
    val edges = (for (_ <- 1 to 80)
      yield (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2).distinct
    val all = (edges ++ edges.map(_.swap)).distinct
    def model(k: Int, rounds: Int): Map[Long, Long] = {
      var adj = all.groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap
      var alive = adj.keySet
      for (_ <- 1 to rounds) {
        val keep = alive.filter(n => (adj(n) & alive).size >= k)
        alive = keep
      }
      alive.map(n => n -> (adj(n) & alive).size.toLong).toMap
    }
    for (k <- Seq(3, 5); parts <- Seq(1, 7)) {
      val got2 = Graph.kCorePeel(all.toDF("a", "b").repartition(parts),
          "a", "b", k, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got2 == model(k, 4), s"k=$k parts=$parts")
    }
  }

  test("weighted pageRank matches the sequential truncating model; uniform weights = unweighted") {
    val we = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 5L),
      (4L, 3L, 1L))
    def model(iters: Int): Map[Long, Long] = {
      val nodes = we.flatMap(e => Seq(e._1, e._2)).distinct
      val ws = we.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
      var r = nodes.map(_ -> 1000000000L).toMap
      for (_ <- 1 to iters) {
        val in = we.groupBy(_._2).map { case (d, xs) =>
          d -> xs.map(e => (r(e._1) * e._3) / ws(e._1)).sum }
        r = nodes.map(n => n -> (150000000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
      }
      r
    }
    for (iters <- Seq(1, 3)) {
      val got = Graph.pageRankWeightedE9(we.toDF("s", "d", "w"),
          "s", "d", "w", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model(iters), s"iters=$iters")
    }
    // all-equal weights reduce EXACTLY to the unweighted operator
    val uw = we.map { case (s, d, _) => (s, d) }
    val flat = Graph.pageRankWeightedE9(
        uw.map { case (s, d) => (s, d, 7L) }.toDF("s", "d", "w"),
        "s", "d", "w", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.pageRankE9(uw.toDF("s", "d"), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat == plain)
  }

  test("degreeAssortativityStats: exact integer Pearson pieces") {
    // star 1→{2,3,4} plus chain 2→3: out-degrees 1:3, 2:1; in-deg 2:1,
    // 3:2, 4:1
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("s", "d")
    val r = Graph.degreeAssortativityStats(e, "s", "d").collect().head
    val m = r.getValuesMap[Long](Seq("n", "sum_x", "sum_y", "sum_xy",
      "sum_xx", "sum_yy", "corr_num", "var_x", "var_y"))
    // per-edge (x=out(src), y=in(dst)): (3,1), (3,2), (3,1), (1,2)
    assert(m("n") == 4L && m("sum_x") == 10L && m("sum_y") == 6L)
    assert(m("sum_xy") == 14L && m("sum_xx") == 28L && m("sum_yy") == 10L)
    assert(m("corr_num") == 4L * 14L - 10L * 6L)
    assert(m("var_x") == 4L * 28L - 100L && m("var_y") == 4L * 10L - 36L)
  }

  test("bfsHops: level-sync frontier matches sequential BFS, seeds at 0") {
    // 1→2→3→4→5 chain plus a shortcut 1→4; 9 unreachable; 8 isolated seed
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 1L))
    val seeds = Seq(Tuple1(1L), Tuple1(8L)).toDF("id")
    val got = Graph.bfsHops(e.toDF("s", "d"), "s", "d", seeds, "id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 1→4 shortcut pulls 5 to hop 2 (not the chain's 4); 9 has only
    // an out-edge into the component, so it stays unreached
    assert(got == Map(1L -> 0L, 8L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L, 5L -> 2L), s"got $got")
    // depth cap: at maxHops=1 only the first frontier lands
    val capped = Graph.bfsHops(e.toDF("s", "d"), "s", "d",
        Seq(Tuple1(1L)).toDF("id"), "id", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("boundedSssp: k-round relaxation = exact over ≤k-edge paths") {
    // direct 1→3 costs 10; detour 1→2→3 costs 2+3=5 but needs 2 rounds
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
      .toDF("s", "d", "w")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    def run(rounds: Int): Map[Long, Long] =
      Graph.boundedSssp(e, "s", "d", "w", seeds, "id", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(run(2) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 11L))
    assert(run(3) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
  }

  test("edgeSupport: per-edge triangle counts against brute force") {
    val rnd = new scala.util.Random(31)
    val es = (0 until 120).map(_ =>
      (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter { case (a, b) => a != b }
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = canon.map { case (a, b) =>
      (a, b) -> (adj(a) & adj(b)).size.toLong
    }.toMap
    val got = Graph.edgeSupport(es.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
  }

  test("edgeSupport: triangle edges get 1, bridge edges get 0") {
    // triangle 1-2-3 plus pendant edge 3-4
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = Graph.edgeSupport(es.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L,
      (3L, 4L) -> 0L))
  }

  test("hitsE6: the authority every hub cites dominates; hubs rank by reach") {
    import spark.implicits._
    // hubs 1,2,3 all point at authority 10; only hub 1 also points at 11
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("s", "d")
    val got = Graph.hitsE6(edges, "s", "d", iterations = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got(("auth", 10L)) == 1000000L) // cited by all hubs
    assert(got(("auth", 11L)) < got(("auth", 10L)))
    assert(got(("hub", 1L)) == 1000000L) // reaches both authorities
    assert(got(("hub", 2L)) == got(("hub", 3L)))
    assert(got(("hub", 2L)) < got(("hub", 1L)))
  }

  test("hitsE6 is partitioning-invariant") {
    import spark.implicits._
    val edges = (1L to 400L).map(i => (i % 37, i % 11)).toDF("s", "d")
    def run(parts: Int) = Graph.hitsE6(edges.repartition(parts),
      "s", "d", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(1) == run(13))
  }

  test("twoHopAggregate: layer-2 re-aggregation equals the path census") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // path graph 1→2→3→4 plus 1→3; features x(v) = 10·v
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("s", "d")
    val f = Seq(1L, 2L, 3L, 4L).map(v => (v, 10L * v)).toDF("id", "x")
    val got = Graph.twoHopAggregate(e.repartition(3), "s", "d", f, "id", "x")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger), r.getLong(3),
          BigInt(r.getDecimal(4).toBigInteger))).toMap
    // 1: N={2,3} sum1=50; 2-hop multiset {3 (via 2), 4 (via 3)} → n2=2, sum2=70
    assert(got(1L) == ((2L, BigInt(50), 2L, BigInt(70))))
    // 3: N={4}, 4 has no out-neighbors → layer-2 zeros
    assert(got(3L) == ((1L, BigInt(40), 0L, BigInt(0))))
    // 2: N={3}; 3's layer-1 = (1, 40) → n2=1, sum2=40
    assert(got(2L) == ((1L, BigInt(30), 1L, BigInt(40))))
    assert(!got.contains(4L)) // no out-edges → no layer-1 row
  }
  test("linkPredictionRA: path + star hand graph, adjacency excluded") {
    // path 1-2-3 and star 4-{5,6,7}
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (4L, 7L))
      .toDF("u", "v")
    val got = Graph.linkPredictionRA(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // (1,3) share center 2 (deg 2): ra = 1e12 div 2
    assert(got(1L -> 3L) == ((1L, 500000000000L)))
    // star leaves pair through hub 4 (deg 3): ra = 1e12 div 3
    for (p <- Seq(5L -> 6L, 5L -> 7L, 6L -> 7L))
      assert(got(p) == ((1L, 333333333333L)))
    // existing edges never reappear as candidates
    assert(!got.contains(1L -> 2L) && !got.contains(4L -> 5L))
    assert(got.size == 4)
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.alternatingComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute-force components: min reachable id per node. */
  private def ccBrute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet
    nodes.map { n =>
      var seen = Set(n); var frontier = Set(n)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      n -> seen.min
    }.toMap
  }

  test("alternating large/small-star components match brute force") {
    // two components + a triangle + a chain tail
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (11L, 12L))
    assert(ccOf(pairs) == ccBrute(pairs))
  }

  test("alternating stars: deep path converges (diameter >> rounds)") {
    // a 300-node path — per-hop propagation needs ~150 rounds even with
    // halving from scratch; the star contraction lands well inside 40
    val pairs = (1L until 300L).map(i => (i, i + 1))
    val got = ccOf(pairs)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 300)
  }

  /** Sequential Brandes with the operator's exact integer discipline:
    * bounded depth, e6 scaling, truncating division. */
  private def refBetweenness(pairs: Seq[(Long, Long)], seedSet: Seq[Long],
      maxDepth: Int): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val bc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val touched = scala.collection.mutable.Set.empty[Long]
    for (s <- seedSet) {
      var levels = Vector(Map(s -> 1L))
      var seen = Set(s)
      for (_ <- 1 to maxDepth) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((v, sig) <- levels.last;
             w <- adj.getOrElse(v, Set.empty) if !seen(w))
          next(w) += sig
        levels :+= next.toMap
        seen ++= next.keySet
      }
      var delta = levels(maxDepth).map { case (v, _) => v -> 0L }
      for (d <- (maxDepth - 1) to 1 by -1) {
        val deeper = levels(d + 1)
        val nd = levels(d).map { case (v, sig) =>
          v -> adj.getOrElse(v, Set.empty).toSeq.filter(deeper.contains)
            .map(w => sig * (1000000L + delta(w)) / deeper(w)).sum
        }
        nd.foreach { case (v, x) => bc(v) += x; touched += v }
        delta = nd
      }
    }
    touched.map(v => v -> bc(v)).toMap
  }

  test("betweenness matches the sequential integer Brandes reference") {
    // path with a bridge node and a side triangle:
    //   1-2-3-4-5, 3-6, 6-7, 2-7 (cycle through 7)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L),
      (6L, 7L), (2L, 7L))
    val both = pairs ++ pairs.map(p => (p._2, p._1))
    val seedSet = Seq(1L, 4L, 7L)
    val got = Graph.betweennessE6(both.toDF("a", "b"), "a", "b",
        seedSet.toDF("id"), "id", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refBetweenness(pairs, seedSet, 3))
    // the path's interior (2, 3) must broker more than leaves
    assert(got(2L) > got(5L) && got(3L) > got(5L))
  }

  test("betweenness: depth horizon truncates dependencies") {
    val pairs = (1L until 8L).map(i => (i, i + 1)) // a 8-node path
    val both = pairs ++ pairs.map(p => (p._2, p._1))
    val got = Graph.betweennessE6(both.toDF("a", "b"), "a", "b",
        Seq(1L).toDF("id"), "id", maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refBetweenness(pairs, Seq(1L), 4))
    // beyond the horizon nothing accumulates: node 5+ score 0 or absent
    assert(!got.contains(6L) && !got.contains(7L))
  }

  test("alternating stars agree with connectedComponents on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val viaStars = ccOf(pairs)
    val viaLabels = Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars == viaLabels)
    assert(viaStars == ccBrute(pairs))
  }

  test("richClubE6: K4 plus a pendant — hand-computed profile") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant edge (4,5):
    // degrees 1,2,3 → 3; 4 → 4; 5 → 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.richClubE6(edges, "a", "b", ks = Seq(2, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // k=2: club {1,2,3,4} is the complete K4 → φ = 1e6 exactly
    assert(got(2L) == ((4L, 6L, 1000000L)))
    // k=3: only node 4 qualifies → no pairs, φ NULL
    assert(got(3L) == ((1L, 0L, -1L)))
  }

  test("harmonicClosenessE6: path graph from two pivots; horizon cuts") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val piv = Seq(1L, 5L).toDF("id")
    val got = Graph.harmonicClosenessE6(edges, "a", "b", piv, "id", 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // distances from 1: 0..4; from 5: 4..0
    assert(got(1L) == ((1L, 250000L)))          // only pivot 5, d=4
    assert(got(2L) == ((2L, 1000000L + 333333L)))
    assert(got(3L) == ((2L, 1000000L)))         // 500000 + 500000
    assert(got(4L) == ((2L, 1333333L)))
    assert(got(5L) == ((1L, 250000L)))

    // horizon 2: node 4 sees only pivot 5 (d=1); node 1's view of 5
    // is cut entirely
    val cut = Graph.harmonicClosenessE6(edges, "a", "b", piv, "id", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(cut(4L) == ((1L, 1000000L)))
    assert(!cut.contains(1L) || cut(1L)._1 == 0L)
  }

  test("attributeAssortativityE6: hand mixing matrix; all-same " +
      "degenerate → NULL") {
    import spark.implicits._
    // edges (1,2),(3,4) within-attr, (1,3) across; X={1,2}, Y={3,4}
    // r = (4·6 − 18)·1e6 div (36 − 18) = 333_333
    val edges = Seq((1L, 2L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val attrs = Seq((1L, "X"), (2L, "X"), (3L, "Y"), (4L, "Y"))
      .toDF("n", "at")
    val r = Graph.attributeAssortativityE6(edges, "a", "b", attrs,
      "n", "at").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((6L, 4L)))
    assert(BigInt(r.getDecimal(2).toBigInteger) == 18)
    assert(r.getLong(3) == 333333L)

    // single-attribute graph: denominator 0 → NULL, not 1
    val one = Graph.attributeAssortativityE6(
      Seq((1L, 2L)).toDF("a", "b"), "a", "b",
      Seq((1L, "X"), (2L, "X")).toDF("n", "at"), "n", "at")
      .collect().head
    assert(one.isNullAt(3))
  }

  test("moransIE6: perfectly assortative components → I = 1; " +
      "crossed pairing → I = −1") {
    import spark.implicits._
    val vals = Seq((1L, 1L), (2L, 1L), (3L, 9L), (4L, 9L))
      .toDF("id", "x")
    val assort = Graph.moransIE6(
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"), "a", "b", vals, "id",
      "x").collect().head
    assert((assort.getLong(0), assort.getLong(1)) == ((4L, 4L)))
    assert(assort.getLong(4) == 1000000L)
    assert(assort.getLong(5) == -333333L) // −1e6 div (n−1)

    val crossed = Graph.moransIE6(
      Seq((1L, 3L), (2L, 4L)).toDF("a", "b"), "a", "b", vals, "id",
      "x").collect().head
    assert(crossed.getLong(4) == -1000000L)
  }
}
