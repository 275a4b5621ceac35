package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("frontier2D keeps exactly the undominated cells") {
    // maximize q, minimize c. (5,10) dominates (5,11), (4,12), (3,10 is
    // NOT dominated? (5,10) has q>3, c=10<=10, strictly better on q →
    // dominated). (6,20) survives (best q), (5,10) survives, (2,5)
    // survives (cheapest), (4,7) survives.
    val rows = Seq((6, 20), (5, 10), (5, 11), (4, 12), (3, 10), (2, 5),
      (4, 7), (4, 7)).toDF("q", "c")
    val got = Skyline.frontier2D(rows, col("q"), col("c"), "quality", "cost")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((6L, 20L, 1L), (5L, 10L, 1L), (4L, 7L, 2L),
      (2L, 5L, 1L)))
  }

  test("equal cells merge; same-q larger-c is dominated") {
    val rows = Seq((1, 1), (1, 1), (1, 2)).toDF("q", "c")
    val got = Skyline.frontier2D(rows, col("q"), col("c"), "q", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 2L)))
  }
}
