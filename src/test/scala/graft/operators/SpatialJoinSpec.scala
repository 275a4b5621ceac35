package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], rx: Long, ry: Long) =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib && math.abs(xa - xb) <= rx && math.abs(ya - yb) <= ry
    } yield (ia, ib, math.abs(xa - xb), math.abs(ya - yb))).toSet

  test("matches brute force, including cross-cell and boundary pairs") {
    // deterministic pseudo-random points; radii chosen so pairs span
    // same-cell, adjacent-cell, and exactly-at-radius cases
    val rnd = new scala.util.Random(7)
    val pts = (0L until 80L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val onBoundary = Seq((900L, 0L, 0L), (901L, 50L, 0L), (902L, 0L, 30L))
    val all = pts ++ onBoundary
    for ((rx, ry) <- Seq((50L, 30L), (100L, 100L), (1L, 1L))) {
      val got = SpatialJoin.boxSelfJoin(all.toDF("id", "x", "y"),
          "id", col("x"), col("y"), rx, ry)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == brute(all, rx, ry), s"rx=$rx ry=$ry")
    }
  }

  test("negative coordinates are rejected loudly") {
    val df = Seq((1L, -5L, 10L), (2L, 3L, 4L)).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      SpatialJoin.boxSelfJoin(df, "id", col("x"), col("y"), 10L, 10L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative")))
  }
}
