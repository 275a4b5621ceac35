package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LMomentsSpec extends SparkSpec {
  import spark.implicits._

  test("lMomentsE6: uniform 1..4 — symmetric, flat tails; tied " +
      "census matches the span-sum closed forms") {
    val u = Seq(1L, 2L, 3L, 4L).toDF("v")
    val r = LMoments.lMomentsE6(u, col("v")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 2500000L) // λ1 = 2.5
    assert(r.getLong(2) == 833333L)  // λ2 = 10/12
    assert(r.getLong(3) == 333333L)  // L-CV = 1/3
    assert(r.getLong(4) == 0L)       // symmetric → τ3 = 0
    assert(r.getLong(5) == 0L)       // uniform 4-pt → τ4 = 0 exactly

    // ties: 1,1,3,3 → A1 = 16 via span sums, λ2 = 8/12, τ3 = 0
    val t = Seq(1L, 1L, 3L, 3L).toDF("v")
    val s = LMoments.lMomentsE6(t, col("v")).collect().head
    assert(s.getLong(2) == 666666L && s.getLong(4) == 0L)
  }
}
