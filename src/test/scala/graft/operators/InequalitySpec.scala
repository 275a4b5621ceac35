package graft.operators

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double): Long =
    BigDecimal(v).setScale(0, RoundingMode.HALF_UP).toLong

  test("theilDecompositionE6: hand groups match the double mirror and " +
      "the decomposition reproduces the direct global index") {
    // A: x = 1, 3; B: x = 4 → N = 3, X = 8
    val df = Seq(("A", 1L), ("A", 3L), ("B", 4L)).toDF("g", "x")
    val got = Inequality.theilDecompositionE6(df, col("g"), col("x"))
      .collect().map(r => r.getString(0) -> r).toMap

    def term(x: Long, ng: Long, xg: Long): Long =
      r6(x * 1000000.0 / xg * math.log(x.toDouble * ng / xg))
    val ta = term(1, 2, 4) + term(3, 2, 4)
    assert(got("A").getLong(4) == ta)
    assert(got("B").getLong(4) == 0L) // single unit: ln(1) = 0
    assert(got("A").getLong(3) == 500000L) // share
    def between(xg: Long, ng: Long): Long =
      r6(xg * 1000000.0 / 8 * math.log(xg * 3.0 / (8.0 * ng)))
    assert(got("A").getLong(5) == between(4, 2))
    assert(got("B").getLong(5) == between(4, 1))

    // decomposition identity: Σ s_g·T_g div 1e6 + Σ between ≈ direct T
    val within = got.values.map(r =>
      r.getLong(3) * r.getLong(4) / 1000000L).sum
    val betweenSum = got.values.map(_.getLong(5)).sum
    val direct = term(1, 3, 8) + term(3, 3, 8) + term(4, 3, 8)
    assert(((within + betweenSum) - direct).abs <= 3L,
      s"decomposed ${within + betweenSum} vs direct $direct")
  }

  test("theilDecompositionE6: equal values give zero inequality") {
    val df = Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L))
      .toDF("g", "x")
    val got = Inequality.theilDecompositionE6(df, col("g"), col("x"))
      .collect()
    assert(got.forall(_.getLong(4) == 0L))
    assert(got.forall(_.getLong(5) == 0L))
  }

  test("hillTailE6: hand top-k with the double mirror; boundary ties " +
      "contribute zero either way") {
    val df = Seq((100L, 1L), (50L, 2L), (20L, 3L), (10L, 4L), (5L, 5L),
      (1L, 6L)).toDF("x", "id")
    val got = Inequality.hillTailE6(df, col("x"), col("id"), k = 2)
      .collect().head
    def t(x: Long) = r6(math.log(x.toDouble / 20L) * 1000000.0)
    val hill = (t(100) + t(50) + t(20)) / 2
    assert(got.getLong(0) == 2L && got.getLong(1) == 20L)
    assert(got.getLong(2) == hill)
    assert(got.getLong(3) == 1000000000000L / hill)

    // tie at the cut: {9,9,9,9} top-3 all equal → hill 0, alpha NULL
    val tied = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
      .toDF("x", "id")
    val z = Inequality.hillTailE6(tied, col("x"), col("id"), k = 2)
      .collect().head
    assert(z.getLong(2) == 0L && z.isNullAt(3))
  }
}
