package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed layout must make the equi-join exchange-free on both sides
  * while returning exactly the unbucketed join's rows, and bucket-prune
  * point lookups. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def withTables[A](body: => A): A =
    try body finally {
      spark.sql("DROP TABLE IF EXISTS graft_bt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bt_dim")
    }

  test("co-located join is exchange-free and exact") { withTables {
    val root = java.nio.file.Files.createTempDirectory("graft_bt").toString
    val fact = (0L until 4000L).map(i => (i % 500L, i)).toDF("fk", "payload")
    val dim = (0L until 500L).map(i => (i, s"d$i")).toDF("dk", "name")
    BucketedTable.writeBucketed(fact, "graft_bt_fact", root + "/f", 8, "fk", "fk")
    BucketedTable.writeBucketed(dim, "graft_bt_dim", root + "/d", 8, "dk", "dk")

    val joined = BucketedTable.coLocatedJoin(spark, "graft_bt_fact",
      "graft_bt_dim", col("fk") === col("dk"))
    val expected = fact.join(dim, col("fk") === col("dk"))
    assert(joined.except(expected).isEmpty && expected.except(joined).isEmpty)
    assert(joined.count() == 4000L)

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
  }}

  test("point predicate prunes to one bucket's files") { withTables {
    val root = java.nio.file.Files.createTempDirectory("graft_bt2").toString
    val fact = (0L until 4000L).map(i => (i % 500L, i)).toDF("fk", "payload")
    BucketedTable.writeBucketed(fact, "graft_bt_fact", root + "/f", 8, "fk", "fk")
    // autoBucketedScan drops the bucketed-scan OUTPUT PARTITIONING when no
    // join needs it (file-level bucket pruning still fires either way, per
    // the FileSourceStrategy log); pin it on so the plan exposes the
    // SelectedBucketsCount evidence.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val q = spark.table("graft_bt_fact").where(col("fk") === 42L)
      assert(q.count() == 8L)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in plan:\n$plan")
    } finally spark.conf.set(key, prev)
  }}
}
