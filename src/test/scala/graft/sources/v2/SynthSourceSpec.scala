package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.RollingHash

class SynthSourceSpec extends SparkSpec {

  private def synth(rows: Long, seed: Long, partitions: Int): DataFrame =
    spark.read.format("graft-synth")
      .option("rows", rows).option("seed", seed)
      .option("partitions", partitions).load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.orElse(df.queryExecution.optimizedPlan.collectFirst {
      // aggregate plans sit under AQE, which hides the physical scan —
      // the optimized logical plan carries the same Scan instance
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }).getOrElse(sys.error("no v2 scan in plan"))

  test("rows generate deterministically and match the hand splitMix64") {
    val df = synth(100, seed = 0, partitions = 4)
    assert(df.count() == 100L)
    val r = df.where(col("id") === 42L).collect().head
    val h = RollingHash.splitMix64(42L)
    assert(r.getLong(1) == (h >>> 1) % 10000L)
    assert(r.getString(2) ==
      SynthSource.eventTypes(((h >>> 8) % 5L).toInt))
    assert(r.getLong(3) == (h >>> 16) % 100000L)
    assert(r.getLong(4) == (h >>> 24) % 90L)
  }

  test("partition count never changes the generated set") {
    val a = synth(5000, seed = 3, partitions = 1).collect().map(_.toSeq).toSet
    val b = synth(5000, seed = 3, partitions = 16).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 5000)
  }

  test("id filters narrow the generated range at the source") {
    val df = synth(100000, seed = 1, partitions = 8)
      .where(col("id") >= 500L && col("id") < 600L)
    // the scan itself carries the narrowed range — generation-side
    // pruning, not generate-then-drop
    assert(scanDesc(df).contains("[500, 600)"), scanDesc(df))
    assert(df.count() == 100L)
    val ids = df.select(min(col("id")), max(col("id"))).collect().head
    assert(ids.getLong(0) == 500L && ids.getLong(1) == 599L)
  }

  test("column pruning reaches the reader") {
    val df = synth(1000, seed = 1, partitions = 2).select(col("event_type"))
    assert(scanDesc(df).contains("cols=event_type"), scanDesc(df))
    assert(df.distinct().count() == 5L)
  }

  test("non-id predicates stay residual and still apply") {
    val df = synth(10000, seed = 2, partitions = 4)
    val views = df.where(col("event_type") === "view").count()
    val brute = df.collect().count(_.getString(2) == "view")
    assert(views == brute.toLong && views > 0L)
  }

  test("micro-batch stream: paced epochs, exactly the batch rows, resume") {
    val ckpt = java.nio.file.Files.createTempDirectory("synthck").toString
    val q = spark.readStream.format("graft-synth")
      .option("rows", 500).option("seed", 5)
      .option("partitions", 3).option("rowsPerBatch", 200)
      .load()
      .writeStream.format("memory").queryName("synth_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("synth_stream")
    // the stream delivered the exact batch-read content, once
    assert(got.count() == 500L)
    val batch = synth(500, seed = 5, partitions = 3)
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet == batch)
    // pacing: 500 rows at 200/epoch → at least 3 micro-batches
    assert(spark.table("synth_stream").select(col("id")).distinct()
      .count() == 500L)
    // restart semantics via the audit sink (the memory sink refuses
    // checkpoint recovery): run once, then resume — totals must not
    // double-count
    val ck2 = java.nio.file.Files.createTempDirectory("synthck2").toString
    val audit = java.nio.file.Files.createTempDirectory("syntha").toString
    def runAudit(): Unit = {
      val qq = spark.readStream.format("graft-synth")
        .option("rows", 500).option("seed", 5)
        .option("partitions", 3).option("rowsPerBatch", 200)
        .load()
        .writeStream.format("graft-audit")
        .option("path", audit).option("sumCols", "cents")
        .option("checkpointLocation", ck2).outputMode("append").start()
      try qq.processAllAvailable() finally qq.stop()
    }
    runAudit()
    runAudit() // resume: no new ids → no new committed rows
    val eps = spark.read.json(s"$audit/summary_epoch_*.json")
    assert(eps.agg(sum(col("rows"))).head().getLong(0) == 500L)
  }

  test("aggregate pushdown: partials computed inside the source") {
    val df = synth(100000, seed = 7, partitions = 8)
      .where(col("id") >= 10000L && col("id") < 60000L)
      .groupBy(col("day"))
      .agg(count(col("id")).as("n"), sum(col("cents")).as("cents"),
        min(col("user_id")).as("mn"), max(col("user_id")).as("mx"))
    val desc = scanDesc(df)
    assert(desc.contains("PushedAggregates"), desc)
    assert(desc.contains("SUM(cents)") && desc.contains("COUNT"), desc)
    assert(desc.contains("PushedGroupByExpressions: [day]"), desc)
    // values equal a brute-force replay over the raw generator
    val brute = synth(100000, 7, 8).collect()
      .filter(r => r.getLong(0) >= 10000L && r.getLong(0) < 60000L)
      .groupBy(_.getLong(4))
      .map { case (day, rs) =>
        (day, rs.length.toLong, rs.map(_.getLong(3)).sum,
          rs.map(_.getLong(1)).min, rs.map(_.getLong(1)).max)
      }.toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == brute)
  }

  test("aggregate pushdown: string group key + min/max on event_type") {
    val df = synth(20000, seed = 3, partitions = 4)
      .groupBy(col("event_type"))
      .agg(count(col("id")).as("n"), max(col("day")).as("mxd"))
    assert(scanDesc(df).contains("PushedGroupByExpressions: [event_type]"),
      scanDesc(df))
    val brute = synth(20000, 3, 4).collect()
      .groupBy(_.getString(2))
      .map { case (t, rs) => (t, rs.length.toLong, rs.map(_.getLong(4)).max) }
      .toSet
    assert(df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == brute)
  }

  test("aggregate pushdown declines distinct and expression aggregates") {
    // count(DISTINCT …) and sum of an arithmetic expression must fall
    // back to the raw scan — results still correct, no PushedAggregates
    val dd = synth(5000, seed = 1, partitions = 2)
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("u"))
    assert(!scanDesc(dd).contains("PushedAggregates"), scanDesc(dd))
    assert(dd.agg(sum(col("u"))).head().getLong(0) > 0L)
  }

  test("empty range and id equality behave") {
    assert(synth(100, 0, 4).where(col("id") === 7L).count() == 1L)
    assert(synth(100, 0, 4).where(col("id") >= 100L).count() == 0L)
    assert(synth(0, 0, 4).count() == 0L)
  }
}
