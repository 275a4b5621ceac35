package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EnergyDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("energyE6: identical samples give zero; hand case matches the " +
      "brute-force pairwise mirror") {
    val same = (Seq(1L, 2L, 5L).map((_, false)) ++
      Seq(1L, 2L, 5L).map((_, true))).toDF("v", "b")
    val z = EnergyDistance.energyE6(same, col("v"), col("b"))
      .collect().head
    assert(z.getLong(5) == 0L)

    // A = {0, 2}, B = {1, 3, 5}
    val a = Seq(0L, 2L); val b = Seq(1L, 3L, 5L)
    val df = (a.map((_, false)) ++ b.map((_, true))).toDF("v", "b")
    val got = EnergyDistance.energyE6(df, col("v"), col("b"))
      .collect().head
    def meanAbs(x: Seq[Long], y: Seq[Long]): Long = {
      val num = (for (p <- x; q <- y) yield math.abs(p - q)).sum
      (BigInt(num) * 1000000 / (BigInt(x.size) * y.size)).toLong
    }
    val cross = meanAbs(a, b); val wa = meanAbs(a, a)
    val wb = meanAbs(b, b)
    assert((got.getLong(0), got.getLong(1)) == ((2L, 3L)))
    assert(got.getLong(2) == cross)
    assert(got.getLong(3) == wa && got.getLong(4) == wb)
    assert(got.getLong(5) == 2 * cross - wa - wb)
    assert(got.getLong(5) > 0L)
  }
}
