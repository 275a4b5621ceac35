package graft.operators

import graft.SparkSpec

/** Gaps-and-islands interval union: overlapping and touching intervals
  * merge, strict gaps split, and the covered length is exact integer ms
  * regardless of partitioning. */
class IntervalCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("overlap merges, touch merges, strict gap splits") {
    val rows = Seq(
      // u1: [0,10) ∪ [5,15) ∪ [15,20) merge to [0,20); [30,40) is apart
      ("u1", 0L, 10L), ("u1", 5L, 15L), ("u1", 15L, 20L), ("u1", 30L, 40L),
      // u2: identical duplicate intervals collapse into one island
      ("u2", 100L, 110L), ("u2", 100L, 110L),
      // u3: containment — [0,100) swallows [10,20)
      ("u3", 0L, 100L), ("u3", 10L, 20L))
      .toDF("k", "s", "e")
    for (parts <- Seq(1, 4)) {
      val got = IntervalJoin.unionCoverage(rows.repartition(parts),
          Seq("k"), "s", "e")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got("u1") == ((4L, 2L, 30L)), s"parts=$parts: ${got("u1")}")
      assert(got("u2") == ((2L, 1L, 10L)))
      assert(got("u3") == ((2L, 1L, 100L)))
    }
  }

  test("single interval and empty-overlap key shapes") {
    val rows = Seq(("a", 7L, 8L)).toDF("k", "s", "e")
    val got = IntervalJoin.unionCoverage(rows, Seq("k"), "s", "e")
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("a" -> ((1L, 1L, 1L))))
  }
}
