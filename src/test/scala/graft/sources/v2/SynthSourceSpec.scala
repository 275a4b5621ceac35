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
    }.getOrElse(sys.error("no BatchScanExec in plan"))

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

  test("empty range and id equality behave") {
    assert(synth(100, 0, 4).where(col("id") === 7L).count() == 1L)
    assert(synth(100, 0, 4).where(col("id") >= 100L).count() == 0L)
    assert(synth(0, 0, 4).count() == 0L)
  }
}
