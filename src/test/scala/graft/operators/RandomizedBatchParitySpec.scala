package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized differential testing for the newest batch operators — each
  * against a brute-force sequential model over seeded random inputs, at
  * two partitionings (the streaming twin of this discipline lives in
  * RandomizedParitySpec). */
class RandomizedBatchParitySpec extends SparkSpec {
  import spark.implicits._

  test("unionCoverage ≡ brute-force interval merge over random soups") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      val k = s"k${rnd.nextInt(8)}"
      val s0 = rnd.nextInt(100000).toLong
      (k, s0, s0 + 1 + rnd.nextInt(20000))
    }
    def brute: Map[String, (Long, Long, Long)] =
      rows.groupBy(_._1).map { case (k, ivs) =>
        val sorted = ivs.map(iv => (iv._2, iv._3)).sortBy(identity)
        var islands = List.empty[(Long, Long)]
        sorted.foreach { case (s0, e0) =>
          islands match {
            case (cs, ce) :: rest if s0 <= ce =>
              islands = (cs, math.max(ce, e0)) :: rest
            case _ => islands = (s0, e0) :: islands
          }
        }
        k -> (ivs.size.toLong, islands.size.toLong,
          islands.map(i => i._2 - i._1).sum)
      }
    for (parts <- Seq(1, 5)) {
      val got = IntervalJoin.unionCoverage(
          rows.toDF("k", "s", "e").repartition(parts), Seq("k"), "s", "e")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got == brute, s"parts=$parts")
    }
  }

  test("saxWords ≡ sequential PAA/bin model over random series") {
    val rnd = new scala.util.Random(13)
    val breaks = Seq(2000L, 5000L, 8000L)
    val rows = (1 to 6).flatMap { g =>
      val n = 1 + rnd.nextInt(40)
      (1 to n).map(i => (s"g$g", i.toLong, rnd.nextInt(10000).toLong))
    }
    def brute: Map[String, String] =
      rows.groupBy(_._1).map { case (k, vs) =>
        val ordered = vs.sortBy(_._2).map(_._3)
        val n = ordered.size
        val segs = ordered.zipWithIndex
          .groupBy { case (_, i) => i.toLong * 4 / n }
        val word = segs.toSeq.sortBy(_._1).map { case (_, xs) =>
          val s = xs.map(_._1).sum; val m = xs.size.toLong
          if (s >= breaks(2) * m) 'd'
          else if (s >= breaks(1) * m) 'c'
          else if (s >= breaks(0) * m) 'b' else 'a'
        }.mkString
        k -> word
      }
    for (parts <- Seq(1, 4)) {
      val got = Trend.saxWords(rows.toDF("k", "t", "v").repartition(parts),
          Seq("k"), Seq(col("t")), col("v"), 4, breaks)
        .collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(got == brute, s"parts=$parts")
    }
  }

  test("KMeansExact ≡ sequential integer Lloyd over random vectors") {
    val rnd = new scala.util.Random(19)
    val pts: Seq[(Long, Seq[Float])] = (0L until 60L).map(i =>
      i -> Seq.fill(3)((rnd.nextDouble() * 20 - 10).toFloat))
    val iq = pts.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def model(k: Int, iters: Int): Map[Long, (Long, Long)] = {
      var cents = iq.toSeq.sortBy(_._1).take(k).toMap
      def assign(cs: Map[Long, Seq[Long]]) = iq.map { case (id, v) =>
        id -> cs.toSeq.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dd) => (dd, c) }
      }
      for (_ <- 0 until iters) {
        val a = assign(cents)
        val upd = a.groupBy(_._2._1).map { case (cid, ms) =>
          val vs = ms.keys.map(iq).toSeq
          cid -> vs.transpose.map(c => c.sum / vs.size).toSeq
        }
        cents = cents.map { case (c, old) => c -> upd.getOrElse(c, old) }
      }
      assign(cents)
    }
    for (iters <- Seq(1, 2); parts <- Seq(1, 4)) {
      val got = KMeansExact.assign(
          pts.toDF("vec_id", "embedding").repartition(parts),
          "vec_id", "embedding", 4, iters)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == model(4, iters), s"iters=$iters parts=$parts")
    }
  }

  test("NaiveBayes ≡ sequential e6-integer model over random corpora") {
    val rnd = new scala.util.Random(23)
    val vocabA = Seq("ant", "bee", "cat", "dog")
    val vocabB = Seq("cat", "dog", "elk", "fox")
    val docs = (0L until 40L).map { i =>
      val (lbl, voc) = if (rnd.nextBoolean()) ("a", vocabA) else ("b", vocabB)
      val text = Seq.fill(3 + rnd.nextInt(8))(voc(rnd.nextInt(voc.size)))
        .mkString(" ")
      (i, text, lbl)
    }
    def model(): Map[(String, String), Long] = {
      val train = docs.filter(_._1 % 2 == 0)
      val counts = train.flatMap { case (_, t, l) =>
        t.split("\\s+").map(tok => (l, tok)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val vocab = counts.keys.map(_._2).toSet
      val langs = train.map(_._3).distinct.sorted
      val tots = langs.map(l =>
        l -> counts.collect { case ((`l`, _), c) => c }.sum).toMap
      val v = vocab.size.toLong
      def term(l: String, tok: String): Long =
        math.round((math.log(counts.getOrElse((l, tok), 0L) + 1.0) -
          math.log(tots(l) + v.toDouble)) * 1e6)
      val nd = train.groupBy(_._3).map { case (l, d) => l -> d.size.toLong }
      val ntot = train.size.toLong
      def prior(l: String): Long =
        math.round((math.log(nd(l).toDouble) - math.log(ntot.toDouble)) * 1e6)
      docs.filter(_._1 % 2 == 1).flatMap { case (_, t, actual) =>
        val toks = t.split("\\s+").filter(vocab)
        if (toks.isEmpty) None
        else Some((actual, langs.map(l =>
          l -> (prior(l) + toks.map(term(l, _)).sum))
          .minBy { case (l, sc) => (-sc, l) }._1))
      }.groupBy(identity).map { case (k, v2) => k -> v2.size.toLong }
    }
    for (parts <- Seq(1, 4)) {
      val got = NaiveBayes.heldOutConfusion(
          docs.toDF("doc_id", "text", "lang").repartition(parts),
          "doc_id", "text", "lang")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == model(), s"parts=$parts")
    }
  }

  test("bfsHops/boundedSssp ≡ sequential search over random graphs") {
    val rnd = new scala.util.Random(17)
    val edges = (1 to 120)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
        1L + rnd.nextInt(9)))
      .filter(e => e._1 != e._2).distinct
    // sequential BFS
    def bfs(maxHops: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = Map(0L -> 0L)
      var frontier = Set(0L)
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h.toLong)
        frontier = next
      }
      dist
    }
    // sequential Bellman-Ford, k rounds
    def bf(rounds: Int): Map[Long, Long] = {
      var dist = Map(0L -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (s, d, w) =>
          dist.get(s).map(c => d -> (c + w)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
          .mapValues(_.map(_._2).min).toMap
      }
      dist
    }
    val seeds = Seq(Tuple1(0L)).toDF("id")
    val e = edges.toDF("s", "d", "w")
    for (k <- Seq(1, 3)) {
      val gotB = Graph.bfsHops(e, "s", "d", seeds, "id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotB == bfs(k), s"bfs k=$k")
      val gotS = Graph.boundedSssp(e, "s", "d", "w", seeds, "id", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotS == bf(k), s"sssp k=$k")
    }
  }
}
