package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](flag: Boolean = true)(body: => T): T = {
    if (!spark.experimental.extraOptimizations.contains(JoinEliminationRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JoinEliminationRewrite
    spark.conf.set(JoinEliminationRewrite.flagKey, flag.toString)
    try body finally spark.conf.unset(JoinEliminationRewrite.flagKey)
  }

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  // a fact table (fk, some nulls when declared without FK) and a dim
  // table with unique pk — through parquet so the registry's
  // path-suffix identification is exercised for real
  private lazy val (factPath, dimPath) = {
    val root = java.nio.file.Files.createTempDirectory("join_elim").toString
    (1 to 100).map(i => (i.toLong, (i % 10).toLong + 1, i * 7L))
      .toDF("row_id", "fk", "val")
      .write.mode("overwrite").parquet(s"$root/fact.parquet")
    (1L to 10L).map(k => (k, s"dim_$k"))
      .toDF("pk", "name")
      .write.mode("overwrite").parquet(s"$root/dim.parquet")
    (s"$root/fact.parquet", s"$root/dim.parquet")
  }

  private lazy val fact = spark.read.parquet(factPath)
  private lazy val dim = spark.read.parquet(dimPath)

  test("left-outer join to a declared-unique dim disappears") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"), "left")
        .groupBy(col("fk")).agg(sum(col("val")).as("v"))
      assert(joins(q) == 0, q.queryExecution.optimizedPlan.toString)
      // values equal the un-eliminated run
      val base = withRule(flag = false) {
        fact.join(dim, fact("fk") === dim("pk"), "left")
          .groupBy(col("fk")).agg(sum(col("val")).as("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == base)
    }
  }

  test("left-outer elimination survives a filtered dim side") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim.where(col("pk") <= 5L),
          fact("fk") === dim("pk"), "left")
        .select(col("row_id"), col("val"))
      assert(joins(q) == 0, q.queryExecution.optimizedPlan.toString)
      assert(q.count() == 100L)
    }
  }

  test("referencing a dim column blocks elimination") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"), "left")
        .select(col("row_id"), col("name"))
      assert(joins(q) == 1)
    }
  }

  test("without a uniqueness declaration the join stays") {
    ConstraintRegistry.clear()
    withRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"), "left")
        .select(col("row_id"))
      assert(joins(q) == 1)
    }
  }

  test("inner join with declared FK reduces to a not-null filter") {
    ConstraintRegistry.declareForeignKey("/fact.parquet", "fk",
      "/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"))
        .groupBy(col("fk")).agg(count(lit(1)).as("n"))
      assert(joins(q) == 0, q.queryExecution.optimizedPlan.toString)
      val base = withRule(flag = false) {
        fact.join(dim, fact("fk") === dim("pk"))
          .groupBy(col("fk")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == base)
    }
  }

  test("inner elimination refuses a filtered dim side") {
    ConstraintRegistry.declareForeignKey("/fact.parquet", "fk",
      "/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim.where(col("pk") <= 5L),
          fact("fk") === dim("pk"))
        .select(col("row_id"))
      assert(joins(q) == 1)
      assert(q.count() == 50L) // and the join really matters here
    }
  }

  test("inner join without FK declaration (unique only) stays") {
    ConstraintRegistry.clear()
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"))
        .select(col("row_id"))
      assert(joins(q) == 1)
    }
  }

  test("registry suffix match requires a path-component boundary") {
    ConstraintRegistry.clear()
    // "orders.parquet" must not claim ".../customer_orders.parquet":
    // a bare endsWith there would eliminate joins/distincts against
    // the wrong table.
    ConstraintRegistry.declareUnique("orders.parquet", "pk")
    assert(ConstraintRegistry.isUnique("/data/orders.parquet", "pk"))
    assert(ConstraintRegistry.isUnique("orders.parquet", "pk"))
    assert(!ConstraintRegistry.isUnique("/data/customer_orders.parquet", "pk"))
    ConstraintRegistry.declareForeignKey(
      "fact.parquet", "fk", "dim.parquet", "pk")
    assert(ConstraintRegistry.fkTarget("/x/fact.parquet", "fk")
      .contains(("dim.parquet", "pk")))
    assert(ConstraintRegistry.fkTarget("/x/big_fact.parquet", "fk").isEmpty)
    // slash-anchored declarations keep their exact-component behavior
    ConstraintRegistry.declareUnique("/dim.parquet", "c")
    assert(ConstraintRegistry.isUnique("/tmp/t1/dim.parquet", "c"))
    assert(!ConstraintRegistry.isUnique("/tmp/t1/odim.parquet", "c"))
    ConstraintRegistry.clear()
  }

  private def withDistinctRule[T](flag: Boolean = true)(body: => T): T = {
    if (!spark.experimental.extraOptimizations
        .contains(DistinctEliminationRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DistinctEliminationRewrite
    spark.conf.set(DistinctEliminationRewrite.flagKey, flag.toString)
    try body finally spark.conf.unset(DistinctEliminationRewrite.flagKey)
  }

  private def aggsIn(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size

  test("distinct over a declared-unique projection vanishes") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withDistinctRule() {
      val q = dim.select(col("pk"), col("name")).distinct()
      assert(aggsIn(q) == 0, q.queryExecution.optimizedPlan.toString)
      assert(q.count() == 10L)
      // and under a filter too
      val qf = dim.where(col("pk") > 3L).distinct()
      assert(aggsIn(qf) == 0)
      assert(qf.count() == 7L)
    }
  }

  test("distinct without the unique column is a real dedup and stays") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withDistinctRule() {
      val q = fact.select(col("fk")).distinct()
      assert(aggsIn(q) == 1)
      assert(q.count() == 10L)
    }
  }

  test("distinct after a fan-out join stays (pk repeats per fact row)") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withDistinctRule() {
      val q = fact.join(dim, fact("fk") === dim("pk"))
        .select(col("pk"), col("name")).distinct()
      assert(aggsIn(q) == 1, q.queryExecution.optimizedPlan.toString)
      assert(q.count() == 10L)
    }
  }

  test("distinct elimination kill switch") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withDistinctRule(flag = false) {
      val q = dim.distinct()
      assert(aggsIn(q) == 1)
    }
  }

  test("kill switch restores the join") {
    ConstraintRegistry.declareUnique("/dim.parquet", "pk")
    withRule(flag = false) {
      val q = fact.join(dim, fact("fk") === dim("pk"), "left")
        .select(col("row_id"))
      assert(joins(q) == 1)
    }
  }
}
