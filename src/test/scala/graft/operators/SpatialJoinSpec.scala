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

  test("gridDbscan: blobs cluster, noise drops, long snakes need the shortcut") {
    import org.apache.spark.sql.functions.col
    def blob(cx: Long, cy: Long, n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((cx * 10 + 5, cy * 10 + 5))
    // blob A: core cells (0,0)+(1,1) — diagonal adjacency joins them;
    // blob B: core cell (5,5), far away; one lone noise point at (9,9)
    val pts = blob(0, 0, 3) ++ blob(1, 1, 4) ++ blob(5, 5, 3) ++
      Seq((95L, 95L))
    val got = SpatialJoin.gridDbscan(pts.toDF("x", "y").repartition(5),
        col("x"), col("y"), 10, 10, minPts = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set((0L, 0L), (1L, 1L), (5L, 5L))) // noise gone
    assert(got((0L, 0L))._2 == got((1L, 1L))._2)            // A merged
    assert(got((0L, 0L))._2 != got((5L, 5L))._2)            // B separate
    // a 40-cell horizontal snake: plain sweeps would need 40 rounds;
    // 6 shortcut pairs must collapse it to ONE cluster
    val snake = (0 until 40).flatMap(i => blob(i.toLong, 8, 3))
    val labs = SpatialJoin.gridDbscan(snake.toDF("x", "y"),
        col("x"), col("y"), 10, 10, minPts = 3, rounds = 6)
      .collect().map(_.getLong(3)).toSet
    assert(labs.size == 1)
  }
}
