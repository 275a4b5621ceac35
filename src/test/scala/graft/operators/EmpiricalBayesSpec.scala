package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmpiricalBayesSpec extends SparkSpec {
  import spark.implicits._

  test("betaBinomialSmooth: hand MoM prior; the mean-rate item is a " +
      "fixed point") {
    // raw rates 0.4, 0.5, 0.6 → m = 5e5, var = 1e10,
    // α+β = 24e6, α = 12e6
    val df = Seq(("a", 40L, 100L), ("b", 50L, 100L), ("c", 60L, 100L))
      .toDF("i", "x", "n")
    val got = EmpiricalBayes.betaBinomialSmooth(df, col("i"), col("x"),
      col("n"), topK = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b")) // top-2 by (n desc, item)
    val a = got("a")
    assert(a.getLong(3) == 400000L)
    assert(a.getLong(6) == 24000000L && a.getLong(5) == 12000000L)
    // (40e6 + 12e6)·1e6 div 124e6 = 419_354
    assert(a.getLong(4) == 419354L)
    // the item AT the prior mean stays exactly there
    assert(got("b").getLong(4) == 500000L)
  }

  test("betaBinomialSmooth: zero cross-item variance → NULL prior, " +
      "never a fake fit") {
    val df = Seq(("a", 1L, 2L), ("b", 2L, 4L)).toDF("i", "x", "n")
    val got = EmpiricalBayes.betaBinomialSmooth(df, col("i"), col("x"),
      col("n"), topK = 2).collect()
    assert(got.forall(_.isNullAt(4)))
    assert(got.forall(_.isNullAt(6)))
  }
}
