package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("splitConformal: exact q̂ rank, floor-div predictor, coverage") {
    // calib y = {0,10,20,30} → pred = 15, residuals {15,5,5,15};
    // target = min(4, ⌈0.9·5⌉=5) = 4 → q̂ = 15 (the cap path).
    // test y = {0,15,31} → residuals {15,0,16} → covered = 2.
    val rows = Seq((1L, true, 0L), (2L, true, 10L), (3L, true, 20L),
      (4L, true, 30L), (5L, false, 0L), (6L, false, 15L),
      (7L, false, 31L)).map { case (k, c, y) => (k, c, y, "g") }
    val r = Conformal.splitConformal(rows.toDF("k", "cal", "y", "g"),
      col("g"), col("cal"), col("y"), col("k")).collect().head
    assert(r.getAs[Long]("pred") == 15L)
    assert(r.getAs[Long]("n_cal") == 4L)
    assert(r.getAs[Long]("qhat") == 15L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("covered") == 2L)
  }

  test("splitConformal: uncapped ⌈(1−α)(n+1)⌉ rank on a bigger group") {
    // 19 calib points y = 0..18 → pred = 171 div 19 = 9, residuals
    // |y−9| = {9,8,…,1,0,1,…,9}; target = ⌈0.9·20⌉ = 18 → the 18th
    // smallest residual: cum count at r is 2r+1, so rank 18 needs r = 9
    // (cum(8) = 17 < 18 ≤ 19 = cum(9)).
    val calib = (0L until 19L).map(i => (i, true, i))
    val test = Seq((100L, false, 1L), (101L, false, 18L))
    val r = Conformal.splitConformal((calib ++ test).map { case (k, c, y) =>
        (k, c, y, "g") }.toDF("k", "cal", "y", "g"),
      col("g"), col("cal"), col("y"), col("k")).collect().head
    assert(r.getAs[Long]("pred") == 9L)
    assert(r.getAs[Long]("qhat") == 9L)
    // test residuals {8, 9} → both ≤ 9 covered
    assert(r.getAs[Long]("covered") == 2L)
  }
}
