package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RakingSpec extends SparkSpec {
  import spark.implicits._

  // sample cells: (A,X)=2, (A,Y)=1, (B,X)=1; targets rows A→6 B→4,
  // cols X→5 Y→5
  private def sample = (Seq.fill(2)(("A", "X")) ++ Seq(("A", "Y")) ++
    Seq(("B", "X"))).toDF("r", "c")
  private def rowT = Seq(("A", 6L), ("B", 4L)).toDF("k", "t")
  private def colT = Seq(("X", 5L), ("Y", 5L)).toDF("k", "t")

  test("rakeE6: one round matches the hand-computed scaling steps") {
    val got = Raking.rakeE6(sample, col("r"), col("c"), rowT, colT, 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    // row step: AX 2e6→4e6, AY 1e6→2e6, BX 1e6→4e6;
    // col step: X sum 8e6 → AX 4e6·5e6÷8e6 = 2.5e6, BX 2.5e6;
    //           Y sum 2e6 → AY 2e6·5e6÷2e6 = 5e6.
    assert(got(("A", "X")) == 2500000L)
    assert(got(("B", "X")) == 2500000L)
    assert(got(("A", "Y")) == 5000000L)
  }

  test("rakeE6: three rounds match a BigInt sequential mirror and " +
      "converge to the column margins") {
    val got = Raking.rakeE6(sample, col("r"), col("c"), rowT, colT, 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap

    // sequential mirror of the documented recursion
    var w = Map(("A", "X") -> BigInt(2000000), ("A", "Y") -> BigInt(1000000),
      ("B", "X") -> BigInt(1000000))
    val rt = Map("A" -> BigInt(6), "B" -> BigInt(4))
    val ct = Map("X" -> BigInt(5), "Y" -> BigInt(5))
    for (_ <- 1 to 3) {
      val rm = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      w = w.map { case ((r, c), v) =>
        ((r, c), if (rm(r) > 0) v * rt(r) * 1000000 / rm(r) else BigInt(0)) }
      val cm = w.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      w = w.map { case ((r, c), v) =>
        ((r, c), if (cm(c) > 0) v * ct(c) * 1000000 / cm(c) else BigInt(0)) }
    }
    w.foreach { case (k, v) => assert(got(k) == v.toLong, s"cell $k") }

    // last step was the column step → observed col margins hit the
    // targets exactly up to per-cell truncation (≤ 1 ulp per cell)
    val xSum = got(("A", "X")) + got(("B", "X"))
    assert((xSum - 5000000L).abs <= 2L)
    assert((got(("A", "Y")) - 5000000L).abs <= 1L)
  }

  test("rakeE6: a sample-only margin (no target row) collapses to 0") {
    val s2 = (sample.as[(String, String)].collect() :+ (("Z", "X")))
      .toSeq.toDF("r", "c")
    val got = Raking.rakeE6(s2, col("r"), col("c"), rowT, colT, 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(got(("Z", "X")) == 0L)
    assert(got(("A", "Y")) > 0L)
  }
}
