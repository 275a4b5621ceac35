package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PowerAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("mdeSampleSize: hand case — variance, ceil sample size, isqrt MDE") {
    // {10,20,30}: n=3, mean=20, s² = (3·1400−3600) div 6 = 100;
    // liftDenom=2 → Δ=10: n_req = ⌈2·2802²·100 / (100·1e6)⌉ = 16;
    // r2 = 2·100·1e12 div 3, isqrt = 8_164_965,
    // mde = 2802·8164965 div 1000 = 22_878_231.
    val df = Seq(("g", 10L), ("g", 20L), ("g", 30L), ("solo", 7L))
      .toDF("grp", "x")
    val got = PowerAnalysis.mdeSampleSize(df, Seq("grp"), col("x"),
        liftDenom = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert(g.getLong(1) == 3L && g.getLong(2) == 20L)
    assert(g.getLong(3) == 100L && g.getLong(4) == 10L)
    assert(g.getLong(5) == 16L)
    assert(g.getLong(6) == 22878231L)
    // single-row segment: no variance → all NULL planners
    val s = got("solo")
    assert(s.isNullAt(3) && s.isNullAt(5) && s.isNullAt(6))
  }

  test("zero target lift (mean below liftDenom) yields NULL n_required") {
    val df = Seq(("g", 1L), ("g", 3L)).toDF("grp", "x") // mean 2, Δ = 0
    val r = PowerAnalysis.mdeSampleSize(df, Seq("grp"), col("x"))
      .collect().head
    assert(r.getLong(4) == 0L && r.isNullAt(5))
    assert(!r.isNullAt(6)) // MDE needs no target — still answered
  }
}
