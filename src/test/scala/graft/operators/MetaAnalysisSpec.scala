package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetaAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("derSimonianLairdE6: homogeneous strata → τ² = 0, " +
      "random ≡ fixed") {
    // d = 0.1, 0.3 (e6), v = 1 (e12) → W = 1e12 each, fixed = 0.2;
    // Q = 2·1e12·(1e5)²/1e18 = 0.02 < df → τ² clamps to 0
    val strata = Seq((100000L, 1000000000000L),
      (300000L, 1000000000000L)).toDF("d", "v")
    val got = MetaAnalysis.derSimonianLairdE6(strata, col("d"),
      col("v")).collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 0L)
    assert(got.getLong(2) == 200000L) // fixed
    assert(got.getLong(3) == 20000L)  // q_e6 = 0.02·1e6
    assert(got.getLong(4) == 0L)      // tau2
    assert(got.getLong(5) == 200000L) // random = fixed
  }

  test("derSimonianLairdE6: heterogeneous strata inflate τ² exactly; " +
      "degenerate stratum dropped loudly") {
    // d = 0, 2 (e6), v = 1 (e12): Q = 2, df = 1, C_real = 1 → τ² = 1
    // (τ²_e12 = 1e12); plus one v=0 stratum → k_dropped = 1
    val strata = Seq((0L, 1000000000000L), (2000000L, 1000000000000L),
      (500000L, 0L)).toDF("d", "v")
    val got = MetaAnalysis.derSimonianLairdE6(strata, col("d"),
      col("v")).collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 1L)
    assert(got.getLong(2) == 1000000L)          // fixed = 1.0
    assert(got.getLong(3) == 2000000L)          // Q = 2
    assert(got.getLong(4) == 1000000000000L)    // τ² = 1 at e12
    // random weights halve equally → pooled estimate unchanged
    assert(got.getLong(5) == 1000000L)
  }
}
