package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MatviewRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](flag: Boolean)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(MatviewRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MatviewRewrite
    spark.conf.set(MatviewRewrite.flagKey, flag.toString)
    try body finally {
      spark.conf.unset(MatviewRewrite.flagKey)
      MatviewRegistry.clear()
    }
  }

  // base fact: (priority, status, cents); matview: per (priority, status)
  private lazy val (basePath, viewPath) = {
    val root = java.nio.file.Files.createTempDirectory("matview").toString
    val rows = (0 until 4000).map { i =>
      (s"P${i % 5}", if (i % 3 == 0) "F" else "O", (i % 997).toLong)
    }
    rows.toDF("priority", "status", "cents")
      .write.mode("overwrite").parquet(s"$root/base")
    spark.read.parquet(s"$root/base")
      .groupBy(col("priority"), col("status"))
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$root/view")
    (s"$root/base", s"$root/view")
  }

  private def registered(): DataFrame = {
    val base = spark.read.parquet(basePath)
    MatviewRegistry.register(base, spark.read.parquet(viewPath),
      dims = Seq("priority", "status"),
      sums = Map("cents" -> "sum_cents"), countCol = "cnt")
    base
  }

  private def scansView(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains(viewPath) && !s.contains(basePath)
  }

  test("coarser rollup rewrites to the summary and matches the base") {
    withRule(flag = true) {
      val base = registered()
      val q = base.groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"), count(lit(1)).as("n"))
      assert(scansView(q), q.queryExecution.optimizedPlan.toString.take(2000))
      val expect = spark.read.parquet(basePath).groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"), count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect && got.size == 5)
    }
  }

  test("dim filters commute through the rewrite") {
    withRule(flag = true) {
      val base = registered()
      val q = base.where(col("status") === "F").groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"))
      assert(scansView(q), q.queryExecution.optimizedPlan.toString.take(2000))
      val expect = spark.read.parquet(basePath)
        .where(col("status") === "F").groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == expect)
    }
  }

  test("unsound shapes never rewrite: measure filter, distinct, global") {
    withRule(flag = true) {
      val base = registered()
      // filter on the measure — not derivable from the summary
      val f = base.where(col("cents") > 500L).groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"))
      assert(!scansView(f))
      // count(DISTINCT) — never derivable
      val d = base.groupBy(col("priority"))
        .agg(countDistinct(col("cents")).as("u"))
      assert(!scansView(d))
      // global aggregate — empty-base semantics differ
      val g = base.agg(sum(col("cents")).as("c"))
      assert(!scansView(g))
      // avg — not registered
      val a = base.groupBy(col("priority")).agg(avg(col("cents")).as("m"))
      assert(!scansView(a))
    }
  }

  test("a non-deterministic filter (sampling) never rewrites") {
    withRule(flag = true) {
      val base = registered()
      // rand() references no column, so the old allDims walk passed it
      // vacuously — rewriting a row-level sample onto one-row-per-dim
      // summary rows would change every aggregate.
      val q = base.where(rand(7) < 0.5).groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"))
      assert(!scansView(q), q.queryExecution.optimizedPlan.toString.take(2000))
    }
  }

  test("kill switch and clear() both restore the base scan") {
    withRule(flag = false) {
      val base = registered()
      val q = base.groupBy(col("priority")).agg(sum(col("cents")).as("c"))
      assert(!scansView(q))
    }
    withRule(flag = true) {
      registered()
      MatviewRegistry.clear()
      val q = spark.read.parquet(basePath).groupBy(col("priority"))
        .agg(sum(col("cents")).as("c"))
      assert(!scansView(q))
    }
  }

  test("the rewrite fires on an UpsertTable snapshot view (q325's shape)") {
    withRule(flag = true) {
      import graft.sinks.UpsertTable
      val root = java.nio.file.Files.createTempDirectory("mv_up").toString
      val rows = (0 until 300).map(i =>
        (i.toLong, s"P${i % 3}", (i % 97).toLong, 1L, false))
        .toDF("k", "prio", "cents", "ver", "del")
      val src = new UpsertTable(s"$root/src", Seq("k"), "ver",
        Nil, Some("del"))
      src.upsert(rows)
      val baseView = src.snapshot(spark).select(col("prio"), col("cents"))
      baseView.groupBy(col("prio"))
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(s"$root/view")
      MatviewRegistry.register(baseView, spark.read.parquet(s"$root/view"),
        Seq("prio"), Map("cents" -> "sum_cents"), "cnt")
      val q = baseView.groupBy(col("prio"))
        .agg(sum(col("cents")).as("c"), count(lit(1)).as("n"))
      // the plan must scan the summary, NOT the upsert table's files
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(s"$root/view") && !plan.contains(s"$root/src"),
        plan.take(2000))
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = baseView.groupBy(col("prio"))
        .agg(sum(col("cents")), count(lit(1)))
      MatviewRegistry.clear() // recompute the truth WITHOUT the rewrite
      val truth = want.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == truth)
    }
  }

  test("a fresh read of the same path still matches (canonical compare)") {
    withRule(flag = true) {
      registered()
      val q = spark.read.parquet(basePath).groupBy(col("status"))
        .agg(count(lit(1)).as("n"))
      assert(scansView(q), q.queryExecution.optimizedPlan.toString.take(2000))
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("F", 1334L), ("O", 2666L)))
    }
  }
}
