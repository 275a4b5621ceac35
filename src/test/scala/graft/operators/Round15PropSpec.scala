package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-grade pins for the round-15 operators: each checked against
  * an independent brute-force mirror (exact BigInt combinatorics, a
  * sequential fold, a naive gram counter) over exhaustive or
  * deterministic-seed inputs — not hand-picked single cases. */
class Round15PropSpec extends SparkSpec {
  import spark.implicits._

  test("passAtKE6 equals BigInt C(n-c,k)/C(n,k) exhaustively (n<=12, k<=5)") {
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product /
        (BigInt(1) to BigInt(k)).product
    for (k <- 1 to 5) {
      val cases = for {
        n <- k to 12; c <- 0 to n
      } yield (s"n${n}c$c", n, c)
      val rows = cases.flatMap { case (t, n, c) =>
        (1 to n).map(i => (t, i <= c))
      }
      val got = Preference.passAtKE6(rows.toDF("task", "ok"),
          col("task"), col("ok"), k)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      cases.foreach { case (t, n, c) =>
        val expect = BigInt(1000000) -
          (BigInt(1000000) * choose(n - c, k)) / choose(n, k)
        assert(got(t) == expect.toLong, s"k=$k n=$n c=$c")
      }
    }
  }

  test("eloRatings equals a sequential mirror on a 500-match stream") {
    val matches = (0 until 500).map { i =>
      val a = (i * 7919L) % 23
      val b = (i * 104729L + 1) % 23
      (a, b, (i * 31 % 5) != 0, i.toLong)
    }.filter(m => m._1 != m._2)
    val got = Preference.eloRatings(matches.toDF("a", "b", "aw", "o"),
        col("a"), col("b"), col("aw"), Seq(col("o")), kFactor = 24L,
        initialRating = 1200L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val r = scala.collection.mutable.Map.empty[Long, Long]
    val nm = scala.collection.mutable.Map.empty[Long, Long]
    matches.foreach { case (a, b, aw, _) =>
      val (wn, ls) = if (aw) (a, b) else (b, a)
      val rw = r.getOrElse(wn, 1200L); val rl = r.getOrElse(ls, 1200L)
      val e = math.floor(1000000.0 /
        (1.0 + math.pow(10.0, (rl - rw).toDouble / 400.0)) + 0.5).toLong
      val d = (24L * (1000000L - e)) / 1000000L
      r(wn) = rw + d; r(ls) = rl - d
      nm(wn) = nm.getOrElse(wn, 0L) + 1; nm(ls) = nm.getOrElse(ls, 0L) + 1
    }
    assert(got == r.map { case (p, v) => p -> (v, nm(p)) }.toMap)
    assert(got.values.map(_._1 - 1200L).sum == 0L)
  }

  test("chrFE6 equals a naive gram-counter mirror on seeded word soups") {
    val words = Vector("alpha", "beta", "gam", "dd", "e")
    def soup(seed: Int, len: Int): String =
      (0 until len).map(i => words(((seed + i * 7) * 31 + i) % 5))
        .mkString(" ")
    val pairs = (0 until 20).map(i =>
      ("s", i.toLong, soup(i, 3 + i % 5), soup(i + 3, 2 + i % 6)))
    val maxN = 4
    val got = TextEval.chrFE6(pairs.toDF("source", "pr", "rt", "ct"),
        Seq("source", "pr"), col("rt"), col("ct"), maxN)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    pairs.foreach { case (_, pr, rt, ct) =>
      def gramCounts(s: String, n: Int): Map[String, Long] = {
        val t = s.toLowerCase.replaceAll("\\s+", "")
        if (t.length < n) Map.empty
        else (0 to t.length - n).map(i => t.substring(i, i + n))
          .groupBy(identity).map { case (g, v) => g -> v.size.toLong }
      }
      var sp = 0L; var sr = 0L
      (1 to maxN).foreach { n =>
        val rg = gramCounts(rt, n); val cg = gramCounts(ct, n)
        val o = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0L)) }
          .sum
        val ct2 = cg.values.sum; val rt2 = rg.values.sum
        sp += (if (ct2 > 0) o * 1000000L / ct2 else 0L)
        sr += (if (rt2 > 0) o * 1000000L / rt2 else 0L)
      }
      val p = sp / maxN; val rr = sr / maxN
      val f = if (4 * p + rr > 0) 5 * p * rr / (4 * p + rr) else 0L
      assert(got(pr) == ((p, rr, f)), s"pair $pr")
    }
  }

  test("gaeE6 equals a per-trajectory sequential fold on seeded data") {
    val steps = for {
      traj <- 0L until 7L; t <- 0L until (3 + traj % 5)
    } yield (traj, t,
      ((traj * 37 + t * 101) % 200) - 60,   // signed rewards
      ((traj * 17 + t * 53) % 90) - 20)     // signed values
    val (gE6, lE6, h) = (900000L, 700000L, 3)
    val got = Preference.gaeE6(steps.toDF("traj", "t", "r", "v"),
        col("traj"), Seq(col("t")), col("r"), col("v"), gE6, lE6, h)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getLong(5)))
      .toMap
    def tz(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    val gl = gE6 * lE6 / 1000000L
    val coefs = Iterator.iterate(1000000L)(c => c * gl / 1000000L)
      .take(h + 1).toSeq
    steps.groupBy(_._1).foreach { case (traj, rows0) =>
      val rows = rows0.sortBy(_._2).toVector
      val deltas = rows.indices.map { i =>
        val vNext = if (i + 1 < rows.size) rows(i + 1)._4 else 0L
        rows(i)._3 + tz(gE6 * vNext, 1000000L) - rows(i)._4
      }
      rows.indices.foreach { i =>
        val adv = coefs.zipWithIndex.map { case (c, k) =>
          if (i + k < rows.size) tz(c * deltas(i + k), 1000000L) else 0L
        }.sum
        assert(got((traj, rows(i)._2)) == ((deltas(i), adv)),
          s"traj $traj t ${rows(i)._2}")
      }
    }
  }

  test("temperatureWeightsE6: truncated shares sum to within nDomains of 1e6") {
    val rows = (0 until 5000).map(i => Tuple1(s"d${(i * i + i) % 13}"))
    val out = Mixture.temperatureWeightsE6(rows.toDF("d"), col("d"),
        alphaE6 = 300000L)
      .select("samp_e6", "share_e6").as[(Long, Long)].collect()
    val sampSum = out.map(_._1).sum
    val shareSum = out.map(_._2).sum
    assert(sampSum <= 1000000L && sampSum >= 1000000L - out.length)
    assert(shareSum <= 1000000L && shareSum >= 1000000L - out.length)
  }

  test("hammingPairs equals brute-force all-pairs on seeded fingerprints") {
    // cluster structure: base words perturbed by 0-4 bit flips plus
    // random-ish far points, including negative (high-bit) values
    val base = Seq(0x0123456789abcdefL, 0xfedcba9876543210L,
      -6148914691236517206L)
    val sigs = (0 until 120).map { i =>
      val b = base(i % 3)
      val flips = (0 until (i % 5)).map(k => 1L << ((i * 11 + k * 7) % 64))
      (i.toLong, flips.foldLeft(b)(_ ^ _))
    }
    for (maxDist <- Seq(0, 3, 7)) {
      val got = graft.operators.Dedup.hammingPairs(
          sigs.toDF("id", "sig"), "id", "sig", maxDist)
        .as[(Long, Long, Long)].collect().toSet
      val expect = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
      } yield (ia, ib, d.toLong)).toSet
      assert(got == expect, s"maxDist=$maxDist got ${got.size} expect ${expect.size}")
    }
  }
}

