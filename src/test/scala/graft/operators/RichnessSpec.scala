package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RichnessSpec extends SparkSpec {
  import spark.implicits._

  test("richnessProfileE6: hand-computed Chao1 and Good–Turing") {
    // g1: a a b c → N=4, D=3, F1=2, F2=1
    //   chao1 = 3e6 + 2·1·1e6 div (2·2) = 3_500_000
    //   gt = 2e6 div 4 = 500_000
    val toks = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "c"),
      // g2: all hapax → F2=0 stays defined (bias-corrected form)
      ("g2", "x"), ("g2", "y"))
      .toDF("g", "w")
    val got = Richness.richnessProfileE6(toks, col("g"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4)) ==
      ((4L, 3L, 2L, 1L)))
    assert(g1.getLong(5) == 3500000L)
    assert(g1.getLong(6) == 500000L && g1.getLong(7) == 500000L)
    // g2: N=2 D=2 F1=2 F2=0 → chao1 = 2e6 + 2·1·1e6 div 2 = 3e6;
    // unseen mass = 1e6 (everything is hapax), coverage 0
    val g2 = got("g2")
    assert(g2.getLong(5) == 3000000L)
    assert(g2.getLong(6) == 1000000L && g2.getLong(7) == 0L)
  }

  test("chapmanE6: hand samples with and without the truth audit") {
    import spark.implicits._
    // s1 = {1,2,3,4}, s2 = {3,4,5} (with dups to collapse), m = 2
    // chapman = 5·4·1e6 div 3 − 1e6 = 5_666_666
    val s1 = Seq(1L, 2L, 3L, 4L, 4L).toDF("k")
    val s2 = Seq(3L, 4L, 5L, 5L).toDF("k")
    val base = Richness.chapmanE6(s1, s2).collect().head
    assert((base.getLong(0), base.getLong(1), base.getLong(2)) ==
      ((4L, 3L, 2L)))
    assert(base.getLong(3) == 5666666L)

    val truth = Seq(6L).toDF("truth")
    val audited = Richness.chapmanE6(s1, s2, Some(truth)).collect().head
    assert(audited.getLong(4) == 6L)
    // err = |5_666_666 − 6_000_000|·1e6 div 6_000_000 = 55_555
    assert(audited.getLong(5) == 55555L)
  }
}
