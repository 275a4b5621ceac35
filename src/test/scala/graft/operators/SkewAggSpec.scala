package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("exactDistinctPregrouped: exact counts, Expand-free plan") {
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 9L))
      .toDF("k", "v").repartition(5)
    val q = SkewAgg.exactDistinctPregrouped(rows, Seq("k"), col("v"))
    val got = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((3L, 2L)), "b" -> ((1L, 1L))))
    assert(!q.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("saltedHolistic: shard merge equals the plain distinct set") {
    val rows = (0 until 300).map(i => (s"k${i % 2}", s"v${i % 23}"))
      .toDF("k", "v").repartition(7)
    val got = SkewAgg.saltedHolistic(rows, Seq("k"), col("v"), salts = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val expect = (0 until 23).map(i => s"v$i").sorted
    assert(got("k0") == expect && got("k1") == expect)
  }
}
