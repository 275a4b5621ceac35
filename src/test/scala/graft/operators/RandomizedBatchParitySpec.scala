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

  test("groupAdvantageE6 ≡ BigInt isqrt reference over random groups") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 600).map { i =>
      (s"g${rnd.nextInt(25)}", i.toLong,
        (rnd.nextLong() % 1000000L)) // signed rewards, |r| < 1e6
    }
    def ref: Map[Long, Long] = {
      val byG = rows.groupBy(_._1)
      rows.map { case (g, id, _) =>
        val rs = byG(g).map(_._3).map(BigInt(_))
        val n = BigInt(rs.size)
        val s = rs.sum
        val vn = n * rs.map(x => x * x).sum - s * s
        val sd = BigInt(vn.bigInteger.sqrt())
        val r = BigInt(rows.find(_._2 == id).get._3)
        val adv =
          if (n < 2 || sd <= 0) BigInt(0)
          else (r * n - s) * 1000000 / sd // BigInt / truncates toward zero
        id -> adv.toLong
      }.toMap
    }
    for (parts <- Seq(1, 7)) {
      val got = Preference.groupAdvantageE6(
          rows.toDF("g", "id", "r").repartition(parts), Seq("g"), col("r"))
        .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
      assert(got == ref, s"parts=$parts")
    }
  }

  test("krippendorffAlphaNominal ≡ sequential coincidence model") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 50).flatMap { u =>
      val m = 1 + rnd.nextInt(10) // includes unpairable single-rating units
      (1 to m).map(_ => (u.toLong, s"c${rnd.nextInt(4)}"))
    }
    def lcmTo(k: Int): Long = {
      @annotation.tailrec
      def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
      (1 until k).foldLeft(1L)((acc, x) => acc / gcd(acc, x) * x)
    }
    val s = BigInt(lcmTo(16))
    val units = rows.groupBy(_._1).filter(_._2.size >= 2)
    val n = BigInt(units.values.map(_.size).sum)
    val a = units.values.map { vs =>
      val m = vs.size
      vs.groupBy(_._2).values
        .map(g => BigInt(g.size) * (g.size - 1) * (s / (m - 1))).sum
    }.sum
    val ncs = units.values.flatten.groupBy(_._2).values.map(g => BigInt(g.size))
    val n2 = ncs.map(x => x * x).sum
    val num = (n - 1) * a + s * (n - n2)
    val den = s * (n * n - n2)
    val wantE6 = if (den == 0) None else Some((num * 1000000 / den).toLong)
    val got = Preference.krippendorffAlphaNominal(
      rows.toDF("u", "c"), col("u"), col("c")).collect().head
    assert(BigInt(got.getAs[java.math.BigDecimal]("alpha_num")
      .toBigIntegerExact) == num)
    assert(BigInt(got.getAs[java.math.BigDecimal]("alpha_den")
      .toBigIntegerExact) == den)
    assert(Option(got.getAs[java.lang.Long]("alpha_e6")).map(_.toLong)
      == wantE6)
    assert(got.getAs[Long]("n") == n.toLong)
  }

  test("dawidSkeneOneCoinE6 ≡ sequential hard-EM over random noisy votes") {
    val rnd = new scala.util.Random(23)
    val truth = (0 until 60).map(i => i.toLong -> s"l${rnd.nextInt(3)}").toMap
    // 8 annotators with mixed reliability vote on random item subsets
    val rows = (0 until 8).flatMap { aIdx =>
      val flip = Seq(0, 0, 1, 2, 4, 6, 8, 9)(aIdx) // wrong votes out of 10
      (0 until 60).filter(_ => rnd.nextInt(10) < 7).map { i =>
        val l = if (rnd.nextInt(10) < flip)
          s"l${rnd.nextInt(3)}" else truth(i.toLong)
        (i.toLong, s"a$aIdx", l)
      }
    }
    val k = rows.map(_._3).distinct.size
    def round1e6(x: Double): Long =
      new java.math.BigDecimal(x).setScale(0,
        java.math.RoundingMode.HALF_UP).longValueExact()
    def argmax(scores: Map[(Long, String), Long]): Map[Long, String] =
      scores.groupBy(_._1._1).map { case (i, m) =>
        i -> m.toSeq.map { case ((_, l), sc) => (-sc, l) }.min._2
      }
    def em: Map[Long, String] = {
      var cur = argmax(rows.groupBy(r => (r._1, r._3)).view
        .mapValues(_.size.toLong).toMap)
      for (_ <- 1 to 2) {
        val ws = rows.groupBy(_._2).map { case (a, vs) =>
          val na = vs.size
          val ma = vs.count(v => cur(v._1) == v._3)
          val acc = (ma + 1L) * 1000000L / (na + 2L)
          val p = acc.toDouble / 1000000.0
          a -> round1e6(math.log(p * (k - 1).toDouble / (1.0 - p)) * 1000000.0)
        }
        cur = argmax(rows.groupBy(r => (r._1, r._3)).view
          .mapValues(_.map(v => ws(v._2)).sum).toMap)
      }
      cur
    }
    val want = em
    for (parts <- Seq(1, 9)) {
      val got = Preference.dawidSkeneOneCoinE6(
          rows.toDF("i", "a", "l").repartition(parts),
          col("i"), col("a"), col("l"), iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("pairMarginHistogramE6 ≡ brute floor-bucket histogram") {
    val rnd = new scala.util.Random(29)
    val ratings = (0L until 40L).map(i =>
      (i, 1L + rnd.nextInt(999999).toLong))
    val pairs = (0 until 500).map { _ =>
      val w = rnd.nextInt(40).toLong
      var l = rnd.nextInt(40).toLong
      if (l == w) l = (l + 1) % 40
      (w, l)
    }
    val rmap = ratings.toMap
    val b = 100000L
    def bucket(m: Long): Long =
      if (m >= 0) m / b else -((-m + b - 1) / b)
    val margins = pairs.map { case (w, l) => bucket(rmap(w) - rmap(l)) }
    val tot = margins.size.toLong
    val want = margins.groupBy(identity).map { case (bk, xs) =>
      bk -> (xs.size.toLong, xs.size.toLong * 1000000L / tot) }
    val got = Preference.pairMarginHistogramE6(
        pairs.toDF("w", "l"), col("w"), col("l"),
        ratings.toDF("item", "rating_e6"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }
}
