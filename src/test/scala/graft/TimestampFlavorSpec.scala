package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.agg.ContentMetrics

/** Regression for the round-8 environment shift: the driver-regenerated
  * `events.parquet` stores `ts` with `isAdjustedToUTC=0`, which Spark 4.x
  * infers as TIMESTAMP_NTZ, and `unix_millis` is LTZ-only — 34 queries and
  * 16 specs threw `DATATYPE_MISMATCH` before the `Tables.load` seam
  * normalized it. This spec writes the SAME events in all three parquet
  * flavors the testdata has shipped as (LTZ micros, NTZ micros, and the
  * in-memory NTZ frame that bypasses the load seam) and proves each yields
  * identical epoch-millis results.
  */
class TimestampFlavorSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "2024-03-01 00:10:00", 7L, "view", 0.0, "{}"),
    (2L, "2024-03-01 00:50:00", 7L, "click", 0.0, "{}"),
    (3L, "2024-03-01 01:05:00", 8L, "purchase", 12.34, "{}"),
    (4L, "2024-03-02 23:59:59", 9L, "view", 0.0, "{}"))
    .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")

  private def writeFlavor(ntz: Boolean): String = {
    val dir = Files.createTempDirectory(s"graft_tsflavor_${ntz}").toString
    val ts = if (ntz) to_timestamp($"raw_ts").cast("timestamp_ntz")
             else to_timestamp($"raw_ts")
    // Force the physical parquet annotation: Spark writes TIMESTAMP_NTZ as
    // isAdjustedToUTC=0 and TIMESTAMP as isAdjustedToUTC=1.
    base.withColumn("ts", ts).drop("raw_ts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.load normalizes LTZ and NTZ events parquet identically") {
    val ltzDir = writeFlavor(ntz = false)
    val ntzDir = writeFlavor(ntz = true)
    val ltz = Tables.load(spark, ltzDir, "events")
    val ntzF = Tables.load(spark, ntzDir, "events")
    // Both must come out as session-TZ TIMESTAMP…
    assert(ltz.schema("ts").dataType.typeName == "timestamp")
    assert(ntzF.schema("ts").dataType.typeName == "timestamp")
    // …and produce bit-identical epoch millis.
    def ms(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select($"event_id", unix_millis($"ts").as("ms"))
        .as[(Long, Long)].collect().toSeq.sorted
    assert(ms(ltz) == ms(ntzF))
    // 2024-03-01T00:10:00Z — proves the NTZ wall-clock was read as UTC.
    assert(ms(ntzF).head._2 == 1709251800000L)
  }

  test("ContentMetrics rollups accept an in-memory TIMESTAMP_NTZ column") {
    // Bypasses Tables.load entirely: the cast at the rollup callsite must
    // handle a raw NTZ frame (e.g. an upstream table written by another
    // engine and read with NTZ inference on).
    val ntzEvents = base
      .withColumn("ts", to_timestamp($"raw_ts").cast("timestamp_ntz"))
      .drop("raw_ts")
    val ltzEvents = base
      .withColumn("ts", to_timestamp($"raw_ts"))
      .drop("raw_ts")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      ContentMetrics.hourly(df)
        .select($"window_start_ms", $"view_count", $"gmv_cents")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val got = rows(ntzEvents)
    assert(got == rows(ltzEvents))
    assert(got == Seq(
      (1709251200000L, 1L, 0L),     // hour 00: view + click
      (1709254800000L, 0L, 1234L),  // hour 01: purchase $12.34
      (1709420400000L, 1L, 0L)))    // Mar 2 hour 23: view
  }

  test("file stream over an NTZ-written upstream table runs the hourly chain") {
    // The streaming flagship's failure mode for the same environment
    // shift: a restarted stream whose schema was sampled from an
    // NTZ-written table. envelopeStream must sanitize the schema so the
    // watermark + window chain (LTZ-only) still runs, with values read
    // as UTC instants.
    val dir = writeFlavor(ntz = true)
    // Sample the schema the way a restarted job would: straight from the
    // parquet footer with NTZ inference ON (the poisoned shape).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val sampled = try spark.read.parquet(s"$dir/events.parquet").schema
      finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    assert(sampled("ts").dataType.typeName == "timestamp_ntz") // the poison is real
    val stream = jobs.StreamingJobs.envelopeStream(
      spark, s"$dir/events.parquet", sampled)
    val counted = stream
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("window_start_ms"),
        $"event_type", $"n")
    val q = counted.writeStream.format("memory").queryName("ntz_hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("ntz_hourly")
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(got == Seq(
      (1709251200000L, "click", 1L), (1709251200000L, "view", 1L),
      (1709254800000L, "purchase", 1L), (1709420400000L, "view", 1L)))
  }
}
