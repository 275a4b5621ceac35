package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReliabilitySpec extends SparkSpec {
  import spark.implicits._

  test("cronbachAlphaE6: perfectly parallel items give alpha 1; " +
      "hand case matches the BigInt mirror") {
    // parallel: x1 = x2 = base → ratio = 2·v/(4·v) = 0.5, k=2 →
    // alpha = 2·(1e6 − 500000) div 1 = 1e6
    val par = Seq(("g", 1L), ("g", 2L), ("g", 5L)).toDF("g", "x")
      .select(col("g"), col("x").as("a"), col("x").as("b"))
    val p = Reliability.cronbachAlphaE6(par, Seq("g"),
      Seq(col("a"), col("b"))).collect().head
    assert(p.getLong(3) == 500000L && p.getLong(4) == 1000000L)

    // hand: items (1,4),(2,5),(3,9) per unit
    val rows = Seq(("g", 1L, 4L), ("g", 2L, 5L), ("g", 3L, 9L))
      .toDF("g", "a", "b")
    val got = Reliability.cronbachAlphaE6(rows, Seq("g"),
      Seq(col("a"), col("b"))).collect().head
    val xs = Seq((1L, 4L), (2L, 5L), (3L, 9L))
    val n = BigInt(3)
    def varNum(v: Seq[Long]) =
      n * v.map(x => BigInt(x) * x).sum - BigInt(v.sum) * v.sum
    val num = varNum(xs.map(_._1)) + varNum(xs.map(_._2))
    val den = varNum(xs.map(t => t._1 + t._2))
    val ratio = num * 1000000 / den
    val alpha = BigInt(2) * (1000000 - ratio) / 1
    assert(got.getLong(2) == 2L)
    assert(got.getLong(3) == ratio.toLong)
    assert(got.getLong(4) == alpha.toLong)
  }

  test("cronbachAlphaE6: zero total variance yields NULL, not a lie") {
    // x2 = −x1 ⇒ composite constant
    val df = Seq(("g", 1L, -1L), ("g", 3L, -3L)).toDF("g", "a", "b")
    val got = Reliability.cronbachAlphaE6(df, Seq("g"),
      Seq(col("a"), col("b"))).collect().head
    assert(got.isNullAt(3) && got.isNullAt(4))
  }
}
