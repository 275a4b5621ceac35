package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PriceIndexSpec extends SparkSpec {
  import spark.implicits._

  test("bilateralE6: hand basket — L, P diverge under quantity " +
      "shift; Fisher is their isqrt geometric mean") {
    // base: a p=10 q=10, b p=20 q=10, c only-base
    // curr: a p=20 q=10, b p=10 q=2,  d only-curr
    val base = Seq(("a", 100L, 10L), ("b", 200L, 10L), ("c", 5L, 1L))
      .toDF("i", "v", "q")
    val curr = Seq(("a", 200L, 10L), ("b", 20L, 2L), ("d", 7L, 1L))
      .toDF("i", "v", "q")
    val r = PriceIndex.bilateralE6(base, curr, col("i"), col("v"),
      col("q")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    // L = (20·10 + 10·10)/(10·10 + 20·10) = 1
    assert(r.getLong(3) == 1000000L)
    // P = (20·10 + 10·2)/(10·10 + 20·2) = 220/140
    assert(r.getLong(4) == 1571428L)
    def isqrt(v: BigInt): BigInt = {
      var s = BigInt(math.sqrt(v.toDouble).toLong)
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      s
    }
    assert(r.getLong(5) ==
      isqrt(BigInt(1000000L) * 1571428L).toLong)
  }
}
