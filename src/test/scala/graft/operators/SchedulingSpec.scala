package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SchedulingSpec extends SparkSpec {
  import spark.implicits._

  private def best(rows: Seq[(Long, Long, Long, Long, Long)],
      topK: Int = 10): Map[Long, Long] =
    Scheduling.bestNonOverlapping(rows.toDF("g", "s", "e", "w", "id"),
      col("g"), col("s"), col("e"), col("w"), col("id"), topK)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("best")).toMap

  test("touching intervals are compatible; DP beats the heaviest single") {
    // [0,10)w5 + [10,20)w5 = 10 beats the overlapping [5,15)w9
    val rows = Seq((1L, 0L, 10L, 5L, 1L), (1L, 10L, 20L, 5L, 2L),
      (1L, 5L, 15L, 9L, 3L))
    assert(best(rows) == Map(1L -> 10L))
  }

  test("DP is optimal where greedy-by-weight is not") {
    // w6 spans [0,10); two w4s fit inside disjointly → 8 > 6
    val rows = Seq((1L, 0L, 10L, 6L, 1L), (1L, 2L, 4L, 4L, 2L),
      (1L, 5L, 7L, 4L, 3L))
    assert(best(rows) == Map(1L -> 8L))
  }

  test("topK pre-filter keeps the K heaviest (ties by id)") {
    // topK=2 keeps w9 and w8 (overlapping) → best 9; the w1+w1 pair
    // that would sum to 2 is pruned before the DP
    val rows = Seq((1L, 0L, 10L, 9L, 1L), (1L, 5L, 15L, 8L, 2L),
      (1L, 20L, 30L, 1L, 3L), (1L, 30L, 40L, 1L, 4L))
    assert(best(rows, topK = 2) == Map(1L -> 9L))
  }
}
