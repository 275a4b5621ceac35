package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsRewritesSpec extends SparkSpec {
  import spark.implicits._

  private def withRules[T](aggFlag: Boolean = true,
      rangeFlag: Boolean = true)(body: => T): T = {
    Seq(AggregateEliminationRewrite, RangeContradictionRewrite).foreach {
      r =>
        if (!spark.experimental.extraOptimizations.contains(r))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ r
    }
    spark.conf.set(AggregateEliminationRewrite.flagKey, aggFlag.toString)
    spark.conf.set(RangeContradictionRewrite.flagKey, rangeFlag.toString)
    try body finally {
      spark.conf.unset(AggregateEliminationRewrite.flagKey)
      spark.conf.unset(RangeContradictionRewrite.flagKey)
    }
  }

  private def aggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  private def scans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l }.size

  private def locals(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l }.size

  private lazy val tPath = {
    val root = java.nio.file.Files.createTempDirectory("stats_rw").toString
    (1 to 50).map(i =>
      (i.toLong, (i % 7) + 1, i * 3L, if (i % 5 == 0) None else Some(i * 2L)))
      .toDF("pk", "line_no", "v", "opt")
      .write.mode("overwrite").parquet(s"$root/t.parquet")
    s"$root/t.parquet"
  }

  private lazy val t = spark.read.parquet(tPath)

  test("GROUP BY a declared-unique key eliminates the aggregate") {
    ConstraintRegistry.declareUnique("/t.parquet", "pk")
    withRules() {
      val q = t.groupBy(col("pk")).agg(sum(col("v")).as("sv"),
        count(lit(1)).as("n"), max(col("line_no")).as("mx"),
        count(col("opt")).as("no"), avg(col("v")).as("av"))
      assert(aggs(q) == 0, q.queryExecution.optimizedPlan.toString)
      val got = q.collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
            r.getDouble(5))))
        .toMap
      val want = withRules(aggFlag = false) {
        val b = t.groupBy(col("pk")).agg(sum(col("v")).as("sv"),
          count(lit(1)).as("n"), max(col("line_no")).as("mx"),
          count(col("opt")).as("no"), avg(col("v")).as("av"))
        assert(aggs(b) == 1)
        b.collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
            r.getDouble(5)))).toMap
      }
      assert(got == want)
      assert(got(5L)._4 == 0L) // count(opt) respects the NULL at pk=5
    }
  }

  test("non-unique grouping key leaves the aggregate alone") {
    ConstraintRegistry.declareUnique("/t.parquet", "pk")
    withRules() {
      val q = t.groupBy(col("line_no")).agg(sum(col("v")).as("sv"))
      assert(aggs(q) == 1)
    }
  }

  test("an unmapped aggregate vetoes the rewrite") {
    ConstraintRegistry.declareUnique("/t.parquet", "pk")
    withRules() {
      val q = t.groupBy(col("pk"))
        .agg(collect_list(col("v")).as("xs"))
      assert(aggs(q) == 1)
    }
  }

  test("agg elimination kill switch restores the aggregate") {
    ConstraintRegistry.declareUnique("/t.parquet", "pk")
    withRules(aggFlag = false) {
      val q = t.groupBy(col("pk")).agg(sum(col("v")).as("sv"))
      assert(aggs(q) == 1)
    }
  }

  test("a contradicted range filter folds to an empty local relation") {
    ConstraintRegistry.declareRange("/t.parquet", "line_no", 1L, 7L)
    withRules() {
      val q = t.where(col("line_no") > 50).groupBy(col("line_no"))
        .agg(count(lit(1)).as("n"))
      assert(scans(q) == 0, q.queryExecution.optimizedPlan.toString)
      assert(q.count() == 0L)
      // boundary: > hi-1 is satisfiable, must NOT fold
      val alive = t.where(col("line_no") > 6)
      assert(scans(alive) == 1)
      assert(alive.count() > 0L)
      // equality outside the range folds; inside survives
      assert(scans(t.where(col("line_no") === 9)) == 0)
      assert(scans(t.where(col("line_no") === 7)) == 1)
      // a contradiction under a join folds the whole join
      val j = t.where(col("line_no") >= 8)
        .join(t.select(col("pk").as("pk2")), col("pk") === col("pk2"))
      assert(scans(j) == 0 && locals(j) >= 1,
        j.queryExecution.optimizedPlan.toString)
    }
  }

  test("range contradiction kill switch keeps the scan") {
    ConstraintRegistry.declareRange("/t.parquet", "line_no", 1L, 7L)
    withRules(rangeFlag = false) {
      val q = t.where(col("line_no") > 50)
      assert(scans(q) == 1)
      assert(q.count() == 0L)
    }
  }
}
