package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IntervalLookup

class IntervalLookupSpec extends SparkSpec {
  import spark.implicits._

  private def facts: DataFrame =
    Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 25L), (5L, 100L))
      .toDF("fid", "p").repartition(3)

  // overlapping on purpose: 10 is inside both A and B; 15 only in B;
  // [30, 40) catches nothing; 25 matches nothing (gap)
  private def dims: DataFrame =
    Seq(("A", 0L, 11L), ("B", 10L, 20L), ("C", 30L, 40L))
      .toDF("tier", "s", "e")

  private def viaSpark(joinType: String): Set[(Long, Long, String)] = {
    val j = facts.join(dims,
      col("s") <= col("p") && col("p") < col("e"), joinType)
    j.select(col("fid"), col("p"), col("tier")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("∅"))).toSet
  }

  private def viaCustom(joinType: String): Set[(Long, Long, String)] =
    IntervalLookup.join(facts, dims, "p", "s", "e", joinType)
      .select(col("fid"), col("p"), col("tier")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("∅"))).toSet

  test("inner: equals the BNLJ reference, overlaps k-emit, gaps drop") {
    assert(viaCustom("inner") == viaSpark("inner"))
    // the hand truth: 5→A, 10→A+B, 15→B, 25/100→nothing
    assert(viaCustom("inner") == Set(
      (1L, 5L, "A"), (2L, 10L, "A"), (2L, 10L, "B"), (3L, 15L, "B")))
  }

  test("left_outer: unmatched facts survive with a NULL dim side") {
    assert(viaCustom("left_outer") == viaSpark("left"))
    assert(viaCustom("left_outer").contains((4L, 25L, "∅")) &&
      viaCustom("left_outer").contains((5L, 100L, "∅")))
  }

  test("the plan is BroadcastIntervalJoinExec, not a nested loop") {
    val df = IntervalLookup.join(facts, dims, "p", "s", "e")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastIntervalJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // and the reference Spark form IS the nested loop — the cost story
    val ref = facts.join(dims, col("s") <= col("p") && col("p") < col("e"))
    assert(ref.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("NULL points and NULL bounds never match; empty dim behaves") {
    val f = Seq((1L, Some(5L)), (2L, None)).toDF("fid", "p")
    val d = Seq(("A", Some(0L), Some(11L)), ("N", None, Some(99L)))
      .toDF("tier", "s", "e")
    val inner = IntervalLookup.join(f, d, "p", "s", "e").collect()
    assert(inner.map(_.getLong(0)).toSeq == Seq(1L))
    val lo = IntervalLookup.join(f, d, "p", "s", "e", "left_outer")
    assert(lo.count() == 2L)
    val empty = dims.where(col("s") > 1000L)
    assert(IntervalLookup.join(facts, empty, "p", "s", "e").count() == 0L)
    assert(IntervalLookup.join(facts, empty, "p", "s", "e", "left_outer")
      .count() == 5L)
  }

  test("randomized parity with the BNLJ reference on 2k×200 overlaps") {
    val f = spark.range(2000).selectExpr("id AS fid",
      "CAST(hash(id) % 10000 AS BIGINT) AS p")
    val d = spark.range(200).selectExpr("id AS tid",
      "CAST(hash(id * 7) % 9000 AS BIGINT) AS s")
      .selectExpr("tid", "s", "s + 500 AS e")
    val ref = f.join(d, col("s") <= col("p") && col("p") < col("e"))
      .selectExpr("fid", "tid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IntervalLookup.join(f, d, "p", "s", "e")
      .selectExpr("fid", "tid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref && got.nonEmpty)
  }
}
