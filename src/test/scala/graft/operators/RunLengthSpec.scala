package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RunLengthSpec extends SparkSpec {
  import spark.implicits._

  private def runsOf(rows: Seq[(Long, java.lang.Long)], parts: Int): Long =
    RunLength.runProfile(rows.toDF("k", "v"), Seq(col("k")), Seq("v"),
      partitions = parts).collect().head.getAs[Long]("runs")

  test("runProfile counts runs identically across partition counts") {
    // values by k: a a b b b a c → 4 runs, wherever the seams land
    val rows = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, 5L), (3L, 7L),
      (4L, 7L), (5L, 7L), (6L, 5L), (7L, 9L))
    for (p <- Seq(1, 2, 3, 7)) assert(runsOf(rows, p) == 4L, s"parts=$p")
  }

  test("runProfile merges a null==null seam (IS DISTINCT FROM semantics)") {
    // null null a a b → 3 runs; with 2+ partitions the null run can
    // straddle the range boundary and must still count once
    val rows = Seq[(Long, java.lang.Long)]((1L, null), (2L, null),
      (3L, 4L), (4L, 4L), (5L, 6L))
    for (p <- Seq(1, 2, 5)) assert(runsOf(rows, p) == 3L, s"parts=$p")
  }

  test("deltaProfile is partition-invariant and zigzag-prices negatives") {
    // values 10, 7, 7, 100 → deltas from 0: 10, −3, 0, 93
    // zigzag: 20(5b), 5(3b), 0(1b), 186(8b) → 17 bits total
    val rows = Seq((1L, 10L), (2L, 7L), (3L, 7L), (4L, 100L))
    for (p <- Seq(1, 2, 4)) {
      val r = RunLength.deltaProfile(rows.toDF("k", "v"), Seq(col("k")),
        Seq("v"), partitions = p).collect().head
      assert(r.getAs[Long]("delta_bits") == 17L, s"parts=$p")
      assert(r.getAs[Long]("n_rows") == 4L)
    }
  }

  test("runProfile: n_rows totals and multi-column independence") {
    val df = Seq((1L, 1L, "x"), (2L, 1L, "y"), (3L, 2L, "y"))
      .toDF("k", "a", "b")
    val got = RunLength.runProfile(df, Seq(col("k")), Seq("a", "b"),
        partitions = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("a") == (2L, 3L) && got("b") == (2L, 3L))
  }
}
