package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](flag: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite
    spark.conf.set(ApproxDistinctRewrite.flagKey, flag.toString)
    try body finally spark.conf.unset(ApproxDistinctRewrite.flagKey)
  }

  private val df = (0 until 1000)
    .map(i => (s"g${i % 2}", s"u${i % 57}")).toDF("g", "u")

  test("flag off: COUNT(DISTINCT) stays exact and unrewritten") {
    withRule(flag = false) {
      val q = df.groupBy("g").agg(countDistinct(col("u")).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("hll"))
      assert(q.collect().map(_.getLong(1)).toSeq == Seq(57L, 57L))
    }
  }

  test("flag on: rewritten to one-pass HLL registers + estimate") {
    withRule(flag = true) {
      val q = df.groupBy("g").agg(countDistinct(col("u")).as("d"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("hll_estimate") && opt.contains("hll_registers"),
        opt.take(2000))
      // no distinct expansion: physical plan has no Expand node
      assert(!q.queryExecution.executedPlan.toString.contains("Expand"))
      // p=12 on 57 distincts sits in the linear-counting regime → exact
      assert(q.collect().map(_.getLong(1)).toSeq == Seq(57L, 57L))
    }
  }

  test("multi-arg and filtered distincts pass through untouched") {
    withRule(flag = true) {
      val q = df.groupBy("g").agg(
        count_distinct(col("u"), col("g")).as("d2"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("hll"))
      assert(q.collect().map(_.getLong(1)).toSeq == Seq(57L, 57L))
    }
  }
}
