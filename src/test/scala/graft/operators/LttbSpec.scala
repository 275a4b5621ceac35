package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LttbSpec extends SparkSpec {
  import spark.implicits._

  test("downsample keeps endpoints and the spike (the LTTB point)") {
    // flat line with one huge spike mid-series: whatever the bucket
    // layout, the spike forms the largest triangle and must survive
    val pts = (0L until 30L).map(x =>
      ("a", x, if (x == 13L) 1000L else 5L))
    val got = Lttb.downsample(pts.toDF("s", "x", "y"), col("s"),
        col("x"), col("y"), buckets = 4)
      .collect().map(r => r.getLong(1)).sorted
    assert(got.length == 6) // first + 4 picks + last
    assert(got.head == 0L && got.last == 29L)
    assert(got.contains(13L))
  }

  test("short series pass through untouched") {
    val pts = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L))
    val got = Lttb.downsample(pts.toDF("s", "x", "y"), col("s"),
        col("x"), col("y"), buckets = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("exact area ties break to the smaller x") {
    // symmetric bucket: two candidates with identical triangle areas
    // (same |y − y1| against a flat prev/next line) → smaller x wins
    val pts = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, -10L),
      ("a", 3L, 0L))
    val got = Lttb.downsample(pts.toDF("s", "x", "y"), col("s"),
        col("x"), col("y"), buckets = 1)
      .collect().map(r => r.getLong(1)).sorted
    assert(got.toSeq == Seq(0L, 1L, 3L))
  }
}
