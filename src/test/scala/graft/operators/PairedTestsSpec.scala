package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PairedTestsSpec extends SparkSpec {
  import spark.implicits._

  test("mcnemarE6: hand-computed discordant table is exact; tied group clamps") {
    // group g: n11=3, n10=6, n01=2, n00=1 → |b−c|=4, corrected d=3,
    // stat = 9·1e6 div 8 = 1_125_000.
    val rows =
      Seq.fill(3)(("g", true, true)) ++ Seq.fill(6)(("g", true, false)) ++
      Seq.fill(2)(("g", false, true)) ++ Seq(("g", false, false)) ++
      // group h: b = c = 1 → clamp to 0, stat = 0 (NOT the classical 1).
      Seq(("h", true, false), ("h", false, true)) ++
      // group z: no discordant pairs → NULL.
      Seq(("z", true, true), ("z", false, false))
    val got = PairedTests.mcnemarE6(rows.toDF("grp", "a", "b"),
        Seq("grp"), col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) ==
      ((3L, 6L, 2L, 1L)))
    assert(g.getLong(5) == 8L && g.getLong(6) == 1125000L)
    assert(got("h").getLong(6) == 0L)
    assert(got("z").isNullAt(6) && got("z").getLong(5) == 0L)
  }

  test("mantelHaenszelE6: two hand strata match the BigInt mirror") {
    // stratum 1: a=4 b=1 c=1 d=4 (n=10); stratum 2: a=2 b=2 c=2 d=2 (n=8)
    def cell(st: Long, t: Boolean, o: Boolean, k: Int) =
      Seq.fill(k)((st, t, o))
    val rows =
      cell(1L, true, true, 4) ++ cell(1L, true, false, 1) ++
      cell(1L, false, true, 1) ++ cell(1L, false, false, 4) ++
      cell(2L, true, true, 2) ++ cell(2L, true, false, 2) ++
      cell(2L, false, true, 2) ++ cell(2L, false, false, 2)
    val r = PairedTests.mantelHaenszelE6(rows.toDF("st", "t", "o"),
      Seq("st"), col("t"), col("o")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 18L)
    // R = 16e6/10 + 4e6/8 = 2_100_000; S = 1e6/10 + 4e6/8 = 600_000
    assert(r.getDecimal(2).toBigInteger.longValue == 2100000L)
    assert(r.getDecimal(3).toBigInteger.longValue == 600000L)
    assert(r.getLong(4) == 3500000L) // OR_MH = 3.5
    // dev = (40−25)·1e5 + 0 = 1_500_000
    assert(r.getLong(5) == 1500000L)
    // var = (25e5·25 div 90) + (2e6·16 div 56) = 694444 + 571428
    val varE6 = BigInt(r.getDecimal(6).toBigInteger)
    assert(varE6 == BigInt(2500000L) * 25 / 90 + BigInt(2000000L) * 16 / 56)
    val num = BigInt(1500000L - 500000L)
    assert(r.getLong(7) == (num * num / varE6).toLong)
  }

  test("mantelHaenszelE6: all-concordant strata yield NULL odds ratio") {
    val rows = Seq((1L, true, true), (1L, false, false),
      (2L, true, true), (2L, false, false))
    val r = PairedTests.mantelHaenszelE6(rows.toDF("st", "t", "o"),
      Seq("st"), col("t"), col("o")).collect().head
    assert(r.isNullAt(4)) // S = 0 → OR undefined
  }

  test("cochranQE6: textbook 4-item 3-model block; incomplete item drops") {
    // L = {2,1,3,0}, G = {3,2,1}, T = 6, ΣG² = 14, ΣL² = 14,
    // Q = 2·(3·14 − 36)/(3·6 − 14) = 3 → 3_000_000.
    val rows = Seq(
      (1L, "A", true), (1L, "B", true), (1L, "C", false),
      (2L, "A", true), (2L, "B", false), (2L, "C", false),
      (3L, "A", true), (3L, "B", true), (3L, "C", true),
      (4L, "A", false), (4L, "B", false), (4L, "C", false),
      // item 5 misses model C → dropped, must not pollute T or G
      (5L, "A", true), (5L, "B", true))
    val r = PairedTests.cochranQE6(rows.toDF("item", "m", "x"),
      Seq("item"), col("m"), col("x")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 6L)
    assert(r.getDecimal(4).toBigInteger.longValue == 14L)
    assert(r.getDecimal(5).toBigInteger.longValue == 14L)
    assert(r.getLong(6) == 3000000L)
  }

  test("cochranQE6: declared-complete fast path equals the general path") {
    val rows = Seq(
      (1L, "A", true), (1L, "B", true), (1L, "C", false),
      (2L, "A", true), (2L, "B", false), (2L, "C", false),
      (3L, "A", true), (3L, "B", true), (3L, "C", true),
      (4L, "A", false), (4L, "B", false), (4L, "C", false))
    val gen = PairedTests.cochranQE6(rows.toDF("item", "m", "x"),
      Seq("item"), col("m"), col("x")).collect().head
    val fast = PairedTests.cochranQE6(rows.toDF("item", "m", "x"),
      Seq("item"), col("m"), col("x"), assumeComplete = true)
      .collect().head
    assert(fast.toSeq == gen.toSeq, s"fast $fast vs general $gen")
  }

  test("cochranQE6: all-agree frame has no discrimination → NULL") {
    val rows = Seq((1L, "A", true), (1L, "B", true),
      (2L, "A", false), (2L, "B", false))
    val r = PairedTests.cochranQE6(rows.toDF("item", "m", "x"),
      Seq("item"), col("m"), col("x")).collect().head
    assert(r.isNullAt(6)) // k·T − ΣL² = 2·2 − 4 = 0
  }

  test("jackknifeRatioE6: three equal-size buckets, exact moments") {
    // buckets (s,n): (10,1) (20,1) (30,1): theta = 20e6,
    // loo = {25e6, 20e6, 15e6}, mean 20e6, ss = 2·(5e6)² = 5e13,
    // var = 2·5e13 div 3 = 33_333_333_333_333, se = isqrt = 5_773_502.
    val rows = Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 1L),
      ("g", 3L, 30L, 1L))
    val r = PairedTests.jackknifeRatioE6(rows.toDF("grp", "bk", "x", "y"),
      Seq("grp"), col("bk"), col("x"), col("y")).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 20000000L && r.getLong(4) == 20000000L)
    assert(BigInt(r.getDecimal(5).toBigInteger) ==
      BigInt("33333333333333"))
    assert(r.getLong(6) == 5773502L)
  }

  test("jackknifeRatioE6: a bucket that empties the denominator is excluded") {
    // bucket 2 holds ALL of the denominator mass → N − n_i = 0 for it.
    val rows = Seq(("g", 1L, 10L, 0L), ("g", 2L, 20L, 5L))
    val r = PairedTests.jackknifeRatioE6(rows.toDF("grp", "bk", "x", "y"),
      Seq("grp"), col("bk"), col("x"), col("y")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L) // b_eff = 1
    assert(r.getLong(3) == 6000000L) // theta = 30/5
    assert(r.getLong(4) == 4000000L) // loo of bucket 1 = 20/5
    assert(r.isNullAt(5) && r.isNullAt(6)) // variance needs b_eff ≥ 2
  }

  test("poissonBootstrapRatioE6 matches the sequential Lehmer mirror") {
    val m = 2147483647L
    val ths = Seq(367879441L, 735758882L, 919698602L, 981011843L,
      996340153L, 999405815L)
    def w(rk: Long, r: Int): Long = {
      val s = ((rk % m) + m) % m
      val h1 = (((s * 65537 + r + 1) * 48271) % m + m) % m
      val h2 = (((h1 ^ (h1 / 65536)) * 69621) % m + m) % m
      ths.count(_ <= h2 * 1000000000L / m).toLong
    }
    val rows = (1 to 200).map(i =>
      ("g" + (i % 2), i * 7919L, 100L + i, 1L + (i % 3)))
    val reps = 8
    // sequential mirror
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val thetas = (0 until reps).flatMap { r =>
        val sn = rs.map(x => w(x._2, r) * x._3).sum
        val sd = rs.map(x => w(x._2, r) * x._4).sum
        if (sd <= 0) None else Some(BigInt(sn) * 1000000 / sd)
      }.sorted
      val pn = rs.map(x => BigInt(x._3)).sum
      val pd = rs.map(x => BigInt(x._4)).sum
      g -> ((thetas.length.toLong, (pn * 1000000 / pd).toLong,
        thetas(1).toLong, thetas(thetas.length - 2).toLong))
    }
    val got = PairedTests.poissonBootstrapRatioE6(
        rows.toDF("g", "rk", "x", "y"), Seq("g"), col("rk"), col("x"),
        col("y"), reps = reps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"got $got\nexp $expected")
  }

  test("poissonBootstrapRatioE6: zero denominators excluded, CI NULLs out") {
    val rows = (1 to 20).map(i => ("g", i.toLong, 10L, 0L))
    val r = PairedTests.poissonBootstrapRatioE6(
      rows.toDF("g", "rk", "x", "y"), Seq("g"), col("rk"), col("x"),
      col("y"), reps = 8).collect().head
    assert(r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3) &&
      r.isNullAt(4))
  }

  test("paired tests are invariant to partitioning and input order") {
    val rows = (0 until 4000).map { i =>
      (i % 7L, (i * 7919) % 2 == 0, (i * 104729) % 3 == 0)
    }
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      PairedTests.mcnemarE6(df, Seq("st"), col("t"), col("o"))
        .collect().map(_.toString).sorted.mkString("|"),
      PairedTests.mantelHaenszelE6(df, Seq("st"), col("t"), col("o"))
        .collect().map(_.toString).sorted.mkString("|"))
    val a = run(rows.toDF("st", "t", "o").repartition(1))
    val b = run(rows.reverse.toDF("st", "t", "o").repartition(17))
    assert(a == b)
  }
}
