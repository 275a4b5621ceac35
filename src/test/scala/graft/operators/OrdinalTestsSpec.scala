package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OrdinalTestsSpec extends SparkSpec {
  import spark.implicits._

  test("cliffsDeltaE6: hand pair counts, sign-symmetric") {
    // a = {3,3,5}, b = {1,5}: gt 3, lt 2, ties 1 → δ = 1e6/6
    val df = (Seq(3L, 3L, 5L).map((true, _)) ++
      Seq(1L, 5L).map((false, _))).toDF("a", "v")
    val r = OrdinalTests.cliffsDeltaE6(df, col("a"), col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)))
    assert(BigInt(r.getDecimal(2).toBigInteger) == 3)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 2)
    assert(BigInt(r.getDecimal(4).toBigInteger) == 1)
    assert(r.getLong(5) == 166666L)

    val rev = OrdinalTests.cliffsDeltaE6(df, !col("a"), col("v"))
      .collect().head
    assert(rev.getLong(5) == -166666L) // toward-zero, sign flipped
  }

  test("jonckheereE3: hand ordered groups match the doubled-U and " +
      "null-moment mirror") {
    // g1 = {1,2}, g2 = {2,3}: JT2 = 7, mean2 = 4, V72 = 120
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)).toDF("g", "v")
    val r = OrdinalTests.jonckheereE3(df, col("g"), col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 2L)))
    assert(BigInt(r.getDecimal(2).toBigInteger) == 7)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 4)
    assert(BigInt(r.getDecimal(4).toBigInteger) == 120)
    def isqrt(v: BigInt): BigInt = {
      var s = BigInt(math.sqrt(v.toDouble).toLong)
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      s
    }
    val ts = isqrt(BigInt(120) * 1000000 / 18)
    assert(r.getLong(5) == (BigInt(3) * 1000000 / ts).toLong)
  }

  test("moodsMedianChi2E6: fully separated groups reach chi² = N") {
    // a = {1,2,3} all ≤ median (3), b = {4,5} all above → χ² = 5
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(4L, 5L).map(("b", _)))
      .toDF("g", "v")
    val r = OrdinalTests.moodsMedianChi2E6(df, col("g"), col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 2L, 3L)))
    assert(r.getLong(3) == 5000000L)
  }
}
