package graft.operators

import org.apache.spark.sql.DataFrame

import graft.plans.{IntervalLookupJoin, IntervalLookupStrategy}

/** User-facing surface of the broadcast interval-lookup join
  * ([[graft.plans.IntervalLookupJoin]] — see that file for semantics and
  * the cost argument vs BroadcastNestedLoopJoin). Columns are named, not
  * Column expressions, so references resolve unambiguously against their
  * own side even when both sides share names. */
object IntervalLookup {

  /** `left` enriched with every `dim` row whose [startCol, endCol)
    * contains `left.pointCol` — all three must be LongType (cast
    * upstream; integer domains are what keep range joins exact).
    * `joinType`: "inner" or "left_outer". */
  def join(left: DataFrame, dim: DataFrame, pointCol: String,
      startCol: String, endCol: String,
      joinType: String = "inner"): DataFrame = {
    val leftOuter = joinType match {
      case "inner" => false
      case "left_outer" | "left" => true
      case other => throw new IllegalArgumentException(
        s"interval-lookup join supports inner/left_outer, got $other")
    }
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(IntervalLookupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalLookupStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = dim.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String, side: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' " +
            s"(has: ${plan.output.map(_.name).mkString(", ")})"))
    val node = IntervalLookupJoin(lPlan, rPlan,
      attr(lPlan, pointCol, "left"), attr(rPlan, startCol, "dim"),
      attr(rPlan, endCol, "dim"), leftOuter)
    org.apache.spark.sql.graft.GraftInternal.ofRows(spark, node)
  }
}
