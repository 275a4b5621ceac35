package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls: exact sufficient statistics on a known line") {
    // y = 3x + 2 exactly → slope_num/slope_den = 3, intercept = 2
    val rows = Seq(("a", 0L, 2L), ("a", 1L, 5L), ("a", 2L, 8L),
      ("a", 3L, 11L), ("b", 1L, 7L), ("b", 1L, 9L)).toDF("g", "x", "y")
    val got = Trend.groupedOls(rows, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val (n, sx, sy, num, den, inum) = got("a")
    assert((n, sx, sy) == ((4L, 6L, 26L)))
    assert(num % den == 0 && num / den == 3L)
    assert(inum % den == 0 && inum / den == 2L)
    // all-equal x → degenerate slope_den = 0 sentinel
    assert(got("b")._5 == 0L)
  }

  test("x guard fails loudly beyond maxAbsX") {
    val rows = Seq(("a", 10L, 1L)).toDF("g", "x", "y")
    intercept[Exception] {
      Trend.groupedOls(rows, Seq("g"), col("x"), col("y"), maxAbsX = 5L)
        .collect()
    }
  }

  test("crossCorrE6: lag-1 planted dependence matches the BigInt mirror") {
    import org.apache.spark.sql.functions.col
    // y(d) = 2·x(d−1): the lag-1 pairs are perfectly linear
    val xs = Seq((1L, 1000L), (2L, 3000L), (3L, 2000L), (4L, 4000L))
    val ys = xs.map { case (d, v) => (d + 1, v * 2) }
    def mirror(lag: Int): Option[(Long, Long)] = {
      val ym = ys.toMap
      val pairs = xs.flatMap { case (d, xv) => ym.get(d + lag).map((xv, _)) }
      if (pairs.isEmpty) return None
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val (num, dx, dy) = (n * sxy - sx * sy, n * sxx - sx * sx,
        n * syy - sy * sy)
      if (dx <= 0 || dy <= 0) return Some((pairs.length.toLong, Long.MinValue))
      def isqrt(v: BigInt): BigInt = {
        var s = BigInt(math.sqrt(v.toDouble).toLong)
        while (s * s > v) s -= 1
        while ((s + 1) * (s + 1) <= v) s += 1
        s
      }
      Some((pairs.length.toLong,
        (num * 1000000 / (isqrt(dx) * isqrt(dy))).toLong))
    }
    val got = Trend.crossCorrE6(
        xs.toDF("d", "v"), col("d"), col("v"),
        ys.toDF("d", "v"), col("d"), col("v"), maxLag = 3)
      .collect().map(r => r.getLong(0).toInt ->
        ((r.getLong(1), if (r.isNullAt(5)) Long.MinValue else r.getLong(5))))
      .toMap
    (0 to 3).foreach { lag =>
      mirror(lag).foreach { exp =>
        assert(got(lag) == exp, s"lag $lag: got ${got(lag)} exp $exp")
      }
    }
    // the planted lag dominates and sits within two-root truncation of 1
    assert(got(1)._2 > 1000000L - 200L && got(1)._2 < 1000000L + 200L)
  }

  test("saxWords: PAA segments, cross-multiplied bins, ordered word") {
    // 8 values → 4 segments of 2; segment means 5, 15, 25, 35 against
    // breakpoints 10/20/30 → word "abcd"
    val rows = (1L to 8L).map(i => ("u", i, (i - 1) / 2 * 10 + 5))
      .toDF("k", "t", "v")
    val got = Trend.saxWords(rows, Seq("k"), Seq(col("t")), col("v"),
        segments = 4, breakpoints = Seq(10L, 20L, 30L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(("u", 8L, "abcd")))

    // boundary: mean exactly at a breakpoint takes the UPPER symbol
    // (s >= b·m), decided without division: two values summing to 2·20
    val edge = Seq(("u", 1L, 19L), ("u", 2L, 21L)).toDF("k", "t", "v")
    val w = Trend.saxWords(edge, Seq("k"), Seq(col("t")), col("v"),
        segments = 1, breakpoints = Seq(10L, 20L, 30L))
      .collect().head
    assert(w.getString(2) == "c")

    // ragged n (not divisible by segments): 5 rows → segments sized
    // 2/1/1/1 by the (rn-1)·seg div n rule; partition-invariant
    val ragged = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 100L),
      ("g", 4L, 1L), ("g", 5L, 100L)).toDF("k", "t", "v")
    for (parts <- Seq(1, 5)) {
      val r = Trend.saxWords(ragged.repartition(parts), Seq("k"),
          Seq(col("t")), col("v"), 4, Seq(50L))
        .collect().head
      assert(r.getString(2) == "abab", s"parts=$parts got ${r.getString(2)}")
    }
  }

  test("holtLinear replays the hand fold (alpha=0.2, beta=0.3)") {
    // l1=100,b1=0; y=200: l=(400+800)/10=120, b=(3*20)/10=6;
    // y=50: l=(100+1008) div 10=110, b=(3*(-10)+42) div 10=1
    val df = Seq(("k", 1L, 100L), ("k", 2L, 200L), ("k", 3L, 50L))
      .toDF("g", "t", "y")
    val r = Trend.holtLinear(df, Seq("g"), col("t"), col("y"), 2, 3, 10, 7)
      .collect().head
    assert(r.getAs[Long]("level") == 110L)
    assert(r.getAs[Long]("trend") == 1L)
    assert(r.getAs[Long]("forecast_next") == 111L)
    assert(r.getAs[Long]("forecast_h") == 117L)
  }

  test("holtLinear truncates toward zero on negative trend steps") {
    // y=[10, 0]: l=(0+80)/10=8, b=(3*(8-10)) div 10 = -6 div 10 = 0
    // (floor division would give -1 — the pin that keeps DuckDB parity)
    val r = Trend.holtLinear(Seq(("k", 1L, 10L), ("k", 2L, 0L))
        .toDF("g", "t", "y"), Seq("g"), col("t"), col("y"), 2, 3, 10)
      .collect().head
    assert(r.getAs[Long]("level") == 8L)
    assert(r.getAs[Long]("trend") == 0L)
    // and a genuinely negative accumulated trend survives exactly
    val r2 = Trend.holtLinear(Seq(("k", 1L, 100L), ("k", 2L, 0L))
        .toDF("g", "t", "y"), Seq("g"), col("t"), col("y"), 2, 3, 10)
      .collect().head
    assert(r2.getAs[Long]("level") == 80L)
    assert(r2.getAs[Long]("trend") == -6L)
    assert(r2.getAs[Long]("forecast_next") == 74L)
  }

  test("holtLinear on a single observation is (y, 0)") {
    val r = Trend.holtLinear(Seq(("k", 1L, 42L)).toDF("g", "t", "y"),
      Seq("g"), col("t"), col("y"), 2, 3, 10).collect().head
    assert(r.getAs[Long]("level") == 42L && r.getAs[Long]("trend") == 0L)
  }

  test("holtWinters replays the hand fold and rotates the seasonal queue") {
    // m=2, a=3 b=1 g=2 den=10, y=[10,20,32]: l0=15, s=[-5,5];
    // y=32: L=(3*37+7*15)/10=21, b=(6+0)/10=0,
    // s_new=(2*11+8*(-5)) div 10 = -18 div 10 = -1 → s=[5,-1]
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 32L))
      .toDF("g", "t", "y")
    val r = Trend.holtWinters(df, Seq("g"), col("t"), col("y"),
      m = 2, alphaNum = 3, betaNum = 1, gammaNum = 2, den = 10)
      .collect().head
    assert(r.getAs[Long]("level") == 21L)
    assert(r.getAs[Long]("trend") == 0L)
    assert(r.getAs[Long]("s_next") == 5L)
    assert(r.getAs[Long]("forecast_next") == 26L)
  }

  test("holtWinters emits NULL smoothing fields below one full cycle") {
    val r = Trend.holtWinters(Seq(("k", 1L, 10L)).toDF("g", "t", "y"),
      Seq("g"), col("t"), col("y"), 7, 3, 1, 2, 10).collect().head
    assert(r.getAs[Long]("n_obs") == 1L)
    assert(r.isNullAt(r.fieldIndex("level")))
    assert(r.isNullAt(r.fieldIndex("forecast_next")))
  }

  test("holtWinters recovers a clean period-m pattern's seasonal sign") {
    // strict weekly sawtooth: high on day%2==0; with m=2 the final
    // seasonal indices must carry opposite signs
    val rows = (1 to 40).map(i => ("k", i.toLong,
      if (i % 2 == 0) 1000L else 200L))
    val r = Trend.holtWinters(rows.toDF("g", "t", "y"), Seq("g"),
      col("t"), col("y"), 2, 3, 1, 2, 10).collect().head
    val sNext = r.getAs[Long]("s_next")
    // 40 observations end on an even (high) day, so the NEXT slot due is
    // the odd/low phase → strongly negative seasonal index
    assert(sNext < -100, s"s_next $sNext")
  }

  test("theilSen: median pairwise slope, robust to one spiked observation") {
    // clean y = 3x line with ONE wild spike at x=5: most pairwise slopes
    // remain exactly 3 → median slope is 3/1
    val rows = (1L to 11L).map(x => ("k", x, if (x == 5) 100000L else 3 * x))
    val r = Trend.theilSen(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n_pairs") == 55L)
    assert(r.getAs[Long]("med_num") * 1L ==
      3L * r.getAs[Long]("med_den"), r.toString)
    assert(r.getAs[Long]("slope_e6") == 3000000L)
  }

  test("theilSen lower median is deterministic on even pair counts") {
    // 3 points → 3 pairs (odd); 4 points → 6 pairs, median at rank 3
    val rows = Seq(("k", 1L, 0L), ("k", 2L, 10L), ("k", 3L, 14L),
      ("k", 4L, 30L))
    val r = Trend.theilSen(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y")).collect().head
    // slopes: (10/1, 7/1, 10/1, 4/1, 10/1, 16/1) sorted → 4,7,10,10,10,16;
    // lower median (rank 3) = 10 — but ties order by (num,den):
    // the three 10-slopes have num/den (10,1),(20,2),(30,3)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("slope_e6") == 10000000L)
    assert((r.getAs[Long]("med_num"), r.getAs[Long]("med_den")) == ((10L, 1L)))
  }

  test("classicalDecompose recovers a clean period-3 pattern exactly") {
    // y = 100·t + pattern(t%3) with pattern (+30, 0, −30): linear trend,
    // zero-sum seasonality. Centered MA of 3 over a line + zero-sum
    // cycle = the line value exactly, so S and R recover exactly too.
    val pat = Map(0L -> 30L, 1L -> 0L, 2L -> -30L)
    val rows = (0L to 11L).map(t => ("k", t, 100L * t + pat(t % 3)))
    val got = Trend.classicalDecompose(rows.toDF("g", "t", "y"),
      Seq("g"), col("t"), col("y"), m = 3)
      .collect().map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("trend"), r.getAs[Long]("seasonal"),
          r.getAs[Long]("remainder")))).toMap
    // edge rows (t=0, t=11) drop; interior rows decompose exactly
    assert(!got.contains(0L) && !got.contains(11L) && got.size == 10)
    (1L to 10L).foreach { t =>
      val (tr, s, r) = got(t)
      assert(tr == 100L * t, s"trend at $t: $tr")
      assert(s == pat(t % 3), s"seasonal at $t: $s")
      assert(r == 0L, s"remainder at $t: $r")
    }
  }

  test("classicalDecompose additivity y = T + S + R holds on every row") {
    val rows = (0L to 29L).map(t => ("k", t, (t * 37 % 211) * 100 + t))
    Trend.classicalDecompose(rows.toDF("g", "t", "y"), Seq("g"),
      col("t"), col("y"), m = 7).collect().foreach { r =>
      assert(r.getAs[Long]("y") == r.getAs[Long]("trend") +
        r.getAs[Long]("seasonal") + r.getAs[Long]("remainder"))
    }
  }

  test("holtLinear is partitioning-invariant (the sort pins fold order)") {
    val rows = (1 to 200).map(i => ("k" + i % 3, i.toLong,
      (i * 37 % 211).toLong))
    for (parts <- Seq(1, 7)) {
      val got = Trend.holtLinear(rows.toDF("g", "t", "y").repartition(parts),
        Seq("g"), col("t"), col("y"), 2, 3, 10)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("level"), r.getAs[Long]("trend"))).toMap
      val one = Trend.holtLinear(rows.toDF("g", "t", "y").coalesce(1),
        Seq("g"), col("t"), col("y"), 2, 3, 10)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("level"), r.getAs[Long]("trend"))).toMap
      assert(got == one, s"parts=$parts")
    }
  }

  test("maxDrawdown: hand example, earliest-witness tie-break, monotone = 0") {
    // peaks 10, 8 → troughs: 10→3 (dd 7 at t=4) beats 10→6 (dd 4 at t=2)
    val a = Seq(("a", 1L, 10L), ("a", 2L, 6L), ("a", 3L, 8L),
      ("a", 4L, 3L), ("a", 5L, 9L),
      // b: strictly rising → dd 0, witness = FIRST row (all tie at 0)
      ("b", 1L, 1L), ("b", 2L, 5L),
      // c: the max dd value occurs twice → earliest t wins
      ("c", 1L, 9L), ("c", 2L, 4L), ("c", 3L, 9L), ("c", 4L, 4L))
    val got = Trend.maxDrawdown(a.toDF("g", "t", "y").repartition(7),
        Seq("g"), col("t"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == ((7L, 4L, 10L)))
    assert(got("b") == ((0L, 1L, 1L)))
    assert(got("c") == ((5L, 2L, 9L)))
  }

  test("acfSuffStats: alternating series hits the ±(n−k)/n closed form") {
    // y = +c,−c,… with even n has mean 0, so r_k = sign·(n−k)/n exactly
    val n = 10
    val rows = (1 to n).map(t => ("g", t.toLong * 100, // gappy axis: rank pairs
      if (t % 2 == 1) 7L else -7L))
    val got = Trend.acfSuffStats(rows.toDF("g", "d", "y").repartition(5),
        Seq("g"), col("d"), col("y"), maxLag = 3)
      .collect().map(r => r.getLong(1) -> // lag is column 1
        (BigInt(r.getDecimal(3).toBigInteger),
          BigInt(r.getDecimal(4).toBigInteger))).toMap
    def ratioIs(k: Int, num: Int, den: Int): Boolean = {
      val (a, b) = got(k.toLong)
      a * den == b * num // cross-multiplied equality of the rationals
    }
    assert(ratioIs(1, -(n - 1), n))
    assert(ratioIs(2, n - 2, n))
    assert(ratioIs(3, -(n - 3), n))
  }

  test("rollingOls: exact line recovers slope in every frame, incl. partial") {
    // y = 3x + 5 → slope_num/slope_den ≡ 3 wherever den ≠ 0
    val rows = (1 to 12).map(t => ("g", t.toLong, 3L * t + 5))
    val got = Trend.rollingOls(rows.toDF("g", "t", "y").repartition(4),
      Seq("g"), col("t"), col("y"), window = 7).collect()
    assert(got.length == 12)
    got.foreach { r =>
      val n = r.getLong(2)
      val (num, den) = (BigInt(r.getDecimal(3).toBigInteger),
        BigInt(r.getDecimal(4).toBigInteger))
      if (n == 1) assert(den == 0) // degenerate single-row frame
      else assert(num == den * 3, s"t=${r.getLong(1)}")
    }
    // window trims: t=12's frame is rows 6..12 → n = 7
    assert(got.map(r => r.getLong(1) -> r.getLong(2)).toMap.apply(12L) == 7L)
  }
  test("croston: hand fold over gappy demand, zero rows dropped") {
    // demands (day,q): (1,10) (3,20) (7,30); day 2 zero row must drop
    val rows = Seq(("k", 1L, 10L), ("k", 2L, 0L), ("k", 3L, 20L),
      ("k", 7L, 30L), ("solo", 4L, 9L))
    val got = Trend.croston(rows.toDF("g", "d", "q").repartition(3),
        Seq("g"), col("d"), col("q"), alphaNum = 2, den = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // init z=10 p=1 d=1; (3,20): z=(40+80)/10=12, p=(4+8)/10=1
    // (7,30): z=(60+96)/10=15, p=(8+8)/10=1 → rate 15e6
    assert(got("k") == ((3L, 15L, 1L, 15000000L)))
    // single demand: fold never runs, init state emits
    assert(got("solo") == ((1L, 9L, 1L, 9000000L)))
  }

  test("runsTestE3: perfect alternation and one-run series, " +
      "BigInt-mirrored moments") {
    import spark.implicits._
    // alt: 5,1,5,1,5 → signs 1,0,1,0,1 (mean 3.4), runs 5, n1=3 n2=2
    // blk: 1,1,9,9 → signs 0,0,1,1 (mean 5), runs 2, n1=2 n2=2
    val df = (Seq((1L, 5L), (2L, 1L), (3L, 5L), (4L, 1L), (5L, 5L))
      .map { case (o, v) => ("alt", o, v) } ++
      Seq((1L, 1L), (2L, 1L), (3L, 9L), (4L, 9L))
        .map { case (o, v) => ("blk", o, v) }).toDF("g", "o", "v")
    val got = Trend.runsTestE3(df, Seq("g"), col("o"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap

    def mirror(n: Long, n1: Long, n2: Long, runs: Long)
        : (Long, BigInt, Long) = {
      val mean = 2 * n1 * n2 * 1000000L / n + 1000000L
      val varE12 = BigInt(2) * n1 * n2 * (2 * n1 * n2 - n) *
        BigInt("1000000000000") / (BigInt(n) * n * (n - 1))
      def isqrt(v: BigInt): BigInt = {
        var s = BigInt(math.sqrt(v.toDouble).toLong)
        while (s * s > v) s -= 1
        while ((s + 1) * (s + 1) <= v) s += 1
        s
      }
      val z = (BigInt(runs) * 1000000 - mean) * 1000 / isqrt(varE12)
      (mean, varE12, z.toLong)
    }

    val alt = got("alt")
    assert((alt.getLong(1), alt.getLong(2), alt.getLong(3),
      alt.getLong(4)) == ((5L, 3L, 2L, 5L)))
    val (mA, vA, zA) = mirror(5, 3, 2, 5)
    assert(alt.getLong(5) == mA)
    assert(BigInt(alt.getDecimal(6).toBigInteger) == vA)
    assert(alt.getLong(7) == zA && zA > 0)

    val blk = got("blk")
    assert(blk.getLong(4) == 2L)
    val (mB, vB, zB) = mirror(4, 2, 2, 2)
    assert(blk.getLong(5) == mB)
    assert(BigInt(blk.getDecimal(6).toBigInteger) == vB)
    assert(blk.getLong(7) == zB && zB < 0)
  }

  test("neweyWestE12: alternating series — hand gammas, toward-zero " +
      "quotients on negative covariances") {
    import spark.implicits._
    // days 0..3, v = 0,2,0,2 → mean_e6 = 1e6, d = ∓1e6
    val df = Seq((0L, 0L), (1L, 2L), (2L, 0L), (3L, 2L)).toDF("o", "v")
    val got = Trend.neweyWestE12(df, col("o"), col("v"), maxLag = 5)
      .collect()
      .map(r => r.getLong(0) -> ((BigInt(r.getDecimal(2).toBigInteger),
        r.getLong(3), BigInt(r.getDecimal(4).toBigInteger)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L)) // only observed lags
    assert(got(0L) == ((BigInt("1000000000000"), 1000000L,
      BigInt("1000000000000"))))
    // lag1: gnum = −3e12 → γ = −3e12 div 4 toward zero = −75e10;
    // term = 2·5·(−3e12) div 24 = −1.25e12
    assert(got(1L) == ((BigInt("-750000000000"), 833333L,
      BigInt("-1250000000000"))))
    assert(got(2L) == ((BigInt("500000000000"), 666666L,
      BigInt("666666666666"))))
    assert(got(3L) == ((BigInt("-250000000000"), 500000L,
      BigInt("-250000000000"))))
  }

  test("hurstRsE6: perfect alternation gives scale-invariant R/S " +
      "and H = 0; constant series yields no usable blocks") {
    import spark.implicits._
    // 0,10,0,10,… over 16 points: every block at w = 4 and w = 8 has
    // R_cleared/sd_cleared = 1 exactly → slope across scales = 0
    val alt = (1L to 16L).map(i => (i, if (i % 2 == 1) 0L else 10L))
      .toDF("o", "x")
    val got = Trend.hurstRsE6(alt, col("o"), col("x"), Seq(4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(4L) == ((4L, 1000000L, 0L)))
    assert(got(8L) == ((2L, 1000000L, 0L)))

    val const = (1L to 16L).map(i => (i, 5L)).toDF("o", "x")
    assert(Trend.hurstRsE6(const, col("o"), col("x"), Seq(4, 8))
      .collect().isEmpty)
  }

  test("seasonalStrengthE6: perfect fit → 1e6; pure-noise series → 0") {
    import spark.implicits._
    val dec = Seq(
      // g: remainder ≡ 0, trend and seasonal both vary → both 1e6
      ("g", 10L, 1L, 0L), ("g", 20L, -1L, 0L), ("g", 30L, 1L, 0L),
      // h: flat trend, zero seasonal, noisy remainder → both 0
      ("h", 5L, 0L, 1L), ("h", 5L, 0L, -1L), ("h", 5L, 0L, 3L))
      .toDF("g", "trend", "seasonal", "remainder")
    val got = Trend.seasonalStrengthE6(dec, Seq("g"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("g") == ((1000000L, 1000000L)))
    assert(got("h") == ((0L, 0L)))
  }
}
