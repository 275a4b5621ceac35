package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank statistics must reproduce the textbook closed forms exactly —
  * including midrank tie handling — and stay partitioning-invariant. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: perfect monotone (tie-free) gives cov² = varx·vary") {
    // y = x³ — monotone, wildly non-linear; Spearman must see ρ = 1
    val df = Seq.tabulate(20)(i => (i.toLong + 1, (i.toLong + 1) * (i + 1) * (i + 1)))
      .toDF("x", "y")
    val r = RankStats.spearmanSuffStats(df, col("x"), col("y")).head()
    val (cov, vx, vy) = (BigInt(r.getDecimal(1).toBigInteger),
      BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger))
    assert(r.getLong(0) == 20L)
    assert(cov * cov == vx * vy && cov > 0)
    // tie-free doubled ranks: var_num = n·Σ(2i)² − (n(n+1))² = known form
    val n = BigInt(20)
    val sxx = (1 to 20).map(i => BigInt(2 * i) * BigInt(2 * i)).sum
    assert(vx == n * sxx - (n * (n + 1)) * (n * (n + 1)))
  }

  test("spearman: reversal gives cov = -varx; ties take midranks") {
    val df = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    val r = RankStats.spearmanSuffStats(df, col("x"), col("y")).head()
    assert(BigInt(r.getDecimal(1).toBigInteger) ==
      -BigInt(r.getDecimal(2).toBigInteger))
    // all-tied y: var_y_num = 0 → ρ undefined, stats still exact
    val t = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val rt = RankStats.spearmanSuffStats(t, col("x"), col("y")).head()
    assert(BigInt(rt.getDecimal(3).toBigInteger) == 0)
    assert(BigInt(rt.getDecimal(1).toBigInteger) == 0)
  }

  test("mann-whitney: hand-computed midrank example with ties") {
    // sample1 = {1, 3, 3}, sample2 = {2, 3, 5}
    // sorted: 1(r1) 2(r2) 3,3,3(midrank 4) 5(r6)
    // R1 = 1 + 4 + 4 = 9, U1 = 9 - 3·4/2 = 3 → u1_x2 = 6
    // ties: one group of t=3 → t³−t = 24
    val df = Seq((1L, true), (3L, true), (3L, true),
      (2L, false), (3L, false), (5L, false)).toDF("v", "s1")
    val r = RankStats.mannWhitney(df, col("v"), col("s1")).head()
    assert((r.getLong(0), r.getLong(1)) == (3L, 3L))
    assert(r.getLong(2) == 6L)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 24)
  }

  test("mann-whitney: u1 + u2 = 2·n1·n2; partitioning-invariant") {
    val vs = (1 to 200).map(i => ((i * 7919L) % 50, i % 3 == 0))
    def stats(parts: Int) = {
      val r = RankStats.mannWhitney(
        vs.toDF("v", "s1").repartition(parts), col("v"), col("s1")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2),
        BigInt(r.getDecimal(3).toBigInteger))
    }
    val a = stats(1)
    assert(a == stats(13))
    // complement identity: 2U1 + 2U2 = 2·2·n1n2 with 2U2 from swapped roles
    val sw = RankStats.mannWhitney(vs.toDF("v", "s1"), col("v"), !col("s1")).head()
    assert(a._3 + sw.getLong(2) == 2L * a._1 * a._2)
  }

  test("kendallTauB: textbook concordance census with ties") {
    // pairs over (x,y): (1,1),(1,2),(2,1),(3,3),(3,3)
    // C: (1,1)-(2,?)no(y not <1? (2,1): y 1<1 no) … hand count:
    //   (1,1)⋈(3,3)×2 C, (1,2)⋈(3,3)×2 C, (2,1)⋈(3,3)×2 C → C=6
    //   (1,2)⋈(2,1): x↑ y↓ → D=1
    //   (1,1)⋈(2,1): y tied → neither
    // tie_x2: n_1=2,n_2=1,n_3=2 → 2·1+0+2·1 = 4
    // tie_y2: n_1=2,n_2=1,n_3=2 → 4
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (3L, 3L))
      .toDF("x", "y")
    val r = RankStats.kendallTauB(df.repartition(3), col("x"), col("y")).head()
    assert(r.getLong(0) == 5L)
    assert(BigInt(r.getDecimal(1).toBigInteger) == 6)
    assert(BigInt(r.getDecimal(2).toBigInteger) == 1)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 4)
    assert(BigInt(r.getDecimal(4).toBigInteger) == 4)
    // perfect agreement: C = n(n−1)/2, D = 0, no ties
    val p = RankStats.kendallTauB(
      (1L to 10L).map(i => (i, i * i)).toDF("x", "y"), col("x"), col("y")).head()
    assert(BigInt(p.getDecimal(1).toBigInteger) == 45 &&
      BigInt(p.getDecimal(2).toBigInteger) == 0)
  }

  test("kendallsWE6: perfect concordance, perfect discordance, and a " +
      "hand-computed tied case") {
    // perfect: three raters rank three items identically → W = 1
    val perfect = Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("a", "b", "c")
    val p = RankStats.kendallsWE6(perfect,
      Seq(col("a"), col("b"), col("c"))).collect().head
    assert(p.getLong(0) == 3L && p.getLong(1) == 3L)
    assert(BigInt(p.getDecimal(2).toBigInteger) == 72)
    assert(p.getLong(4) == 1000000L)
    assert(p.getLong(5) == 6000000L) // χ² = m(n−1)W = 3·2·1e6

    // two raters, reversed → rank sums all equal → W = 0
    val rev = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("a", "b")
    val r = RankStats.kendallsWE6(rev, Seq(col("a"), col("b")))
      .collect().head
    assert(BigInt(r.getDecimal(2).toBigInteger) == 0 &&
      r.getLong(4) == 0L)

    // ties: a = 1,2,3; b = 1,1,2 → S2 = 26, ΣT = 6, den = 84,
    // W = 78e6 div 84 = 928_571
    val tied = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("a", "b")
    val t = RankStats.kendallsWE6(tied, Seq(col("a"), col("b")))
      .collect().head
    assert(BigInt(t.getDecimal(2).toBigInteger) == 26)
    assert(BigInt(t.getDecimal(3).toBigInteger) == 6)
    assert(t.getLong(4) == 928571L)
  }

  test("kruskalWallisE6: textbook two-group H; full ties correct " +
      "to the maximum") {
    // a: 1,2; b: 3,4 → H = 2.4 exactly, no ties
    val clean = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val c = RankStats.kruskalWallisE6(clean, col("g"), col("v"))
      .collect().head
    assert((c.getLong(0), c.getLong(1)) == ((4L, 2L)))
    assert(c.getLong(2) == 2400000L)
    assert(BigInt(c.getDecimal(3).toBigInteger) == 0)
    assert(c.getLong(4) == 2400000L)

    // a: 1,1; b: 2,2 → tie-corrected H = N−1 = 3 (the maximum)
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val t = RankStats.kruskalWallisE6(tied, col("g"), col("v"))
      .collect().head
    assert(BigInt(t.getDecimal(3).toBigInteger) == 12)
    assert(t.getLong(4) == 3000000L)
  }
}
