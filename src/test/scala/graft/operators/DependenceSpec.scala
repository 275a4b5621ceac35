package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DependenceSpec extends SparkSpec {
  import spark.implicits._

  test("chatterjeeXiE6: hand values for monotone and U-shaped " +
      "(non-monotone) dependence") {
    // y = x on x = 1..7 → Σ|Δr2| = 2(n−1) = 12, ξ = 1e6 − 36e6/96
    val mono = (1L to 7L).map(x => (x, x, x)).toDF("x", "y", "id")
    val m = Dependence.chatterjeeXiE6(mono, col("x"), col("y"),
      col("id")).collect().head
    assert(m.getLong(0) == 7L && m.getLong(1) == 12L)
    assert(m.getLong(2) == 625000L)

    // y = x² on x = −3..3 (tied y's → midranks): Σ|Δr2| = 22,
    // ξ = 1e6 − 66e6/96 = 312500 — nonzero where Spearman sees ~0
    val u = (-3L to 3L).map(x => (x, x * x, x)).toDF("x", "y", "id")
    val q = Dependence.chatterjeeXiE6(u, col("x"), col("y"),
      col("id")).collect().head
    assert(q.getLong(1) == 22L && q.getLong(2) == 312500L)
  }
}
