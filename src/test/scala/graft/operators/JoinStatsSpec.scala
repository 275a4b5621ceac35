package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinStatsSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeByKey: exact per-key decomposition equals the real join's size") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L, 5L).toDF("k")
    val right = Seq(1L, 1L, 2L, 3L, 3L, 3L, 4L).toDF("j")
    val got = JoinStats.joinSizeByKey(left, col("k"), right, col("j"), 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // key 1: 3*2=6; key 3: 1*3=3; key 2: 2*1=2; keys 4,5 one-sided -> drop
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L), "rows desc, key asc order")
    val byKey = got.toMap
    assert(byKey(1L) == ((3L, 2L, 6L, 6L * 1000000L / 11L)))
    assert(byKey(3L) == ((1L, 3L, 3L, 3L * 1000000L / 11L)))
    assert(byKey(2L) == ((2L, 1L, 2L, 2L * 1000000L / 11L)))
    // the decomposition must sum to the executed join's row count
    val actual = left.join(right, col("k") === col("j")).count()
    assert(got.map(_._2._3).sum == actual)
  }

  test("topK truncates by contribution; null keys ignored") {
    val left = (Seq.fill(5)(Some(7L)) ++ Seq(Some(8L), None)).toDF("k")
    val right = (Seq.fill(4)(Some(7L)) ++ Seq(Some(8L), None)).toDF("j")
    val got = JoinStats.joinSizeByKey(left, col("k"), right, col("j"), 1)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // null never joins; top-1 is key 7 with 20 of 21 rows
    assert(got.toSeq == Seq((7L, 20L, 20L * 1000000L / 21L)))
  }
}
