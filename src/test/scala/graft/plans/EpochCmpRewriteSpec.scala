package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochCmpRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](flag: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(EpochCmpRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EpochCmpRewrite
    spark.conf.set(EpochCmpRewrite.flagKey, flag.toString)
    try body finally spark.conf.unset(EpochCmpRewrite.flagKey)
  }

  // sub-millisecond micros (so floor-division edges are exercised),
  // both epoch signs, plus a NULL; parquet so PushedFilters are
  // observable at the scan.
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("epoch_cmp").toString
    Seq(-2000500L, -2000000L, -1999999L, -1L, 0L, 1L, 999L, 1000L,
      1500L, 2000L).map(Option(_)).:+(Option.empty[Long])
      .toDF("us").selectExpr("timestamp_micros(us) AS ts")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("unix_millis filter becomes a pushed ts range; rows identical") {
    withRule(flag = true) {
      val q = spark.read.parquet(path)
        .withColumn("ms", unix_millis(col("ts")))
        .where(col("ms") >= 1L && col("ms") < 2L)
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("GreaterThanOrEqual(ts") &&
        plan.contains("LessThan(ts"), plan.take(3000))
      // the FILTER no longer evaluates unix_millis (the projection that
      // computes the ms column legitimately still does)
      val filterCond = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.toString
      }.mkString(";")
      assert(!filterCond.contains("unix_millis"), filterCond)
      // floor(us/1000) in [1,2) ⇔ us in [1000, 2000) → {1000, 1500}
      assert(q.count() == 2L)
    }
  }

  test("every comparison op matches brute-force eval on both epoch signs") {
    val lits = Seq(-2001L, -2000L, -2L, -1L, 0L, 1L, 2L)
    val data = spark.read.parquet(path)
    for (l <- lits) {
      val rewritten = withRule(flag = true) {
        Seq(
          data.where(unix_millis(col("ts")) === l).count(),
          data.where(unix_millis(col("ts")) >= l).count(),
          data.where(unix_millis(col("ts")) > l).count(),
          data.where(unix_millis(col("ts")) <= l).count(),
          data.where(unix_millis(col("ts")) < l).count(),
          data.where(lit(l) > unix_millis(col("ts"))).count(),
          data.where(lit(l) <= unix_millis(col("ts"))).count())
      }
      val plain = withRule(flag = false) {
        Seq(
          data.where(unix_millis(col("ts")) === l).count(),
          data.where(unix_millis(col("ts")) >= l).count(),
          data.where(unix_millis(col("ts")) > l).count(),
          data.where(unix_millis(col("ts")) <= l).count(),
          data.where(unix_millis(col("ts")) < l).count(),
          data.where(lit(l) > unix_millis(col("ts"))).count(),
          data.where(lit(l) <= unix_millis(col("ts"))).count())
      }
      assert(rewritten == plain, s"literal $l")
    }
  }

  test("unix_seconds and unix_micros seams rewrite too") {
    withRule(flag = true) {
      val data = spark.read.parquet(path)
      val qs = data.where(unix_seconds(col("ts")) === -3L)
      assert(!qs.queryExecution.optimizedPlan.toString
        .contains("unix_seconds"))
      // floor(us/1e6) = -3 ⇔ us in [-3e6, -2e6) → {-2000500, -2000000... }
      // -2000500 and -2000000 and -1999999 are all >= -3e6; < -2e6 keeps
      // -2000500 only? -2000000 < -2000000 false; -1999999 no. → 1 row
      assert(qs.count() == 1L)
      val qu = data.where(unix_micros(col("ts")) === 1500L)
      assert(!qu.queryExecution.optimizedPlan.toString
        .contains("unix_micros"))
      assert(qu.count() == 1L)
    }
  }

  test("NTZ storage: the UTC-identity cast is stripped, filter pushed") {
    val p = java.nio.file.Files.createTempDirectory("epoch_ntz").toString
    Seq(0L, 1000L, 2000L).toDF("us")
      .selectExpr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts")
      .write.mode("overwrite").parquet(p)
    withRule(flag = true) {
      val q = spark.read.parquet(p)
        .where(unix_millis(col("ts").cast("timestamp")) >= 1L)
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("unix_millis"), plan.take(2000))
      assert(q.count() == 2L)
    }
  }

  test("equality on a non-deterministic child passes through untouched") {
    withRule(flag = true) {
      // The equality range duplicates the seam child into both bounds;
      // a per-row random timestamp would be drawn twice. Must bail.
      val q = spark.range(100)
        .where(expr("""unix_millis(
          timestamp_millis(CAST(rand(7) * 1000 AS LONG))) = 5"""))
      assert(q.queryExecution.optimizedPlan.toString.contains("unix_millis"),
        q.queryExecution.optimizedPlan.toString.take(2000))
    }
  }

  test("kill switch restores the unrewritten plan, same rows") {
    withRule(flag = false) {
      val q = spark.read.parquet(path)
        .where(unix_millis(col("ts")) >= 1L)
      assert(q.queryExecution.optimizedPlan.toString.contains("unix_millis"))
      assert(q.count() == 3L) // 1000, 1500, 2000
    }
  }

  test("overflow-adjacent literals bail out rather than wrap") {
    withRule(flag = true) {
      val data = spark.read.parquet(path)
      // Long.MaxValue ms * 1000 overflows: must keep the original
      // predicate (0 rows, no exception)
      val q = data.where(unix_millis(col("ts")) >= Long.MaxValue)
      assert(q.count() == 0L)
      val q2 = data.where(unix_millis(col("ts")) < Long.MinValue)
      assert(q2.count() == 0L)
    }
  }
}
