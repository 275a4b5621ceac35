package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QueueingSpec extends SparkSpec {
  import spark.implicits._

  test("littlesLawAudit: hand spans — exact L from the interval " +
      "integral, grid aliasing surfaces in the residual") {
    // u1 spans [0, 2h], u2 spans [1h, 2h] → λ = 1/h, W = 5.4e6 ms,
    // L_exact = 1.5; hourly grid {0, 1h, 2h} sees 1, 2, 0 → L_grid = 1
    val ev = Seq((1L, 0L), (1L, 7200000L), (2L, 3600000L),
      (2L, 7200000L)).toDF("u", "t")
    val r = Queueing.littlesLawAudit(ev, col("u"), col("t"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((2L, 7200000L, 3L)))
    assert(r.getLong(3) == 1000000L)  // λ per hour
    assert(r.getLong(4) == 5400000L)  // W ms
    assert(r.getLong(5) == 1500000L)  // L exact
    assert(r.getLong(6) == 1000000L)  // L grid
    assert(r.getLong(7) == 333333L)   // residual ppm
  }
}
