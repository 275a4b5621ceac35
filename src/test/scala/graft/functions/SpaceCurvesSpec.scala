package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceCurvesSpec extends SparkSpec {
  import spark.implicits._

  /** Independent classic xy2d (Wikipedia reference C, transcribed). */
  private def ref(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertIndex matches the reference and is a bijection on 8×8") {
    SpaceCurves.register(spark)
    val cells = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        SpaceCurves.hilbertIndex(col("x"), col("y"), 3).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == ref(3, x, y), s"($x,$y)")
    }
    assert(got.values.toSeq.sorted == (0L until 64L))
  }

  test("hilbert adjacency: consecutive positions are grid neighbors") {
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val byD = cells.map { case (x, y) => ref(4, x, y) -> (x, y) }
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"($x1,$y1)->($x2,$y2)")
    }
  }

  test("zOrderIndex interleaves bits (known values)") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(SpaceCurves.zOrderIndex(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSeq
    // (1,0)=1; (0,1)=2; (3,3)=15; (5,2)=x bits 101 at even, y bits 010
    // at odd → 1 + 0*2 + 0*4 + 8 + 16 + 0*32 = 0b011001 = 25... compute:
    // x=5=101 → bits (i=0)1,(1)0,(2)1 → 1<<0 + 1<<4 = 17
    // y=2=010 → bit (1)=1 → 1<<3 = 8 → total 25
    assert(got == Seq(1L, 2L, 15L, 25L))
  }
}
