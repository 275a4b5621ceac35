package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TruncEqRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](flag: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(TruncEqRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TruncEqRewrite
    spark.conf.set(TruncEqRewrite.flagKey, flag.toString)
    try body finally spark.conf.unset(TruncEqRewrite.flagKey)
  }

  // two days of hourly stamps + a NULL, through parquet so PushedFilters
  // are observable at the scan
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("trunc_eq").toString
    (0 until 48).map(h => Some(h * 3600L * 1000))
      .:+(Option.empty[Long])
      .toDF("ms").selectExpr("timestamp_millis(ms) AS ts")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("aligned day-equality becomes a pushed range; rows identical") {
    withRule(flag = true) {
      val q = spark.read.parquet(path)
        .where(expr("date_trunc('DAY', ts) = timestamp'1970-01-02 00:00:00'"))
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("GreaterThanOrEqual(ts") &&
        plan.contains("LessThan(ts"), plan.take(3000))
      assert(q.count() == 24L)
    }
  }

  test("misaligned literal folds to an impossible predicate (0 rows)") {
    withRule(flag = true) {
      val q = spark.read.parquet(path)
        .where(expr("date_trunc('DAY', ts) = timestamp'1970-01-02 07:00:00'"))
      assert(q.count() == 0L)
    }
  }

  test("kill switch restores the unrewritten plan, same rows") {
    withRule(flag = false) {
      val q = spark.read.parquet(path)
        .where(expr("date_trunc('DAY', ts) = timestamp'1970-01-02 00:00:00'"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("date_trunc"), plan.take(2000))
      assert(q.count() == 24L)
    }
  }

  test("inequalities: aligned + misaligned bounds match brute force") {
    // all four ops × both literal sides × aligned/misaligned literals
    val lits = Seq("1970-01-02 00:00:00", "1970-01-02 07:00:00")
    val ops = Seq(">=", ">", "<=", "<")
    for (l <- lits; op <- ops; flip <- Seq(false, true)) {
      val cond =
        if (flip) s"timestamp'$l' $op date_trunc('DAY', ts)"
        else s"date_trunc('DAY', ts) $op timestamp'$l'"
      val q = () => spark.read.parquet(path).where(expr(cond))
      val (rewritten, plain) = (
        withRule(flag = true)(q().count()),
        withRule(flag = false)(q().count()))
      assert(rewritten == plain, s"$cond: $rewritten vs $plain")
      // and the truncation is gone from the rewritten filter
      withRule(flag = true) {
        assert(!q().queryExecution.optimizedPlan.toString
          .contains("date_trunc"), cond)
      }
    }
  }

  test("a non-deterministic timestamp child passes through untouched") {
    withRule(flag = true) {
      // The rewrite duplicates the child into two bounds; a per-row
      // random timestamp would be drawn twice. Must bail, like Spark's
      // UnwrapCastInBinaryComparison.
      val q = spark.range(100)
        .where(expr("""date_trunc('DAY',
          timestamp_millis(CAST(rand(7) * 172800000 AS LONG)))
          = timestamp'1970-01-02 00:00:00'"""))
      assert(q.queryExecution.optimizedPlan.toString.contains("date_trunc"),
        q.queryExecution.optimizedPlan.toString.take(2000))
    }
  }

  test("unsupported units (WEEK) pass through untouched") {
    withRule(flag = true) {
      val q = spark.read.parquet(path)
        .where(expr("date_trunc('WEEK', ts) = timestamp'1969-12-29 00:00:00'"))
      assert(q.queryExecution.optimizedPlan.toString.contains("date_trunc"))
      assert(q.count() == 48L) // both days fall in the epoch week
    }
  }
}
