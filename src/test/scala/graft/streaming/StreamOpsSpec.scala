package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirstRows drops in-watermark duplicates") {
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDS().toDF("k", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.keepFirstRows(df, Seq("k"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("kfr_out")
      .outputMode("append").start()
    mem.addData(("a", 1000L), ("a", 2000L), ("b", 1000L))
    q.processAllAvailable()
    q.stop()
    val ks = spark.table("kfr_out").select("k").as[String].collect().sorted
    assert(ks.toSeq == Seq("a", "b"))
  }

  test("slidingCounts emits watermark-finalized windows") {
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDS().toDF("k", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.slidingCounts(df, Seq("k"), "ts", "1 second",
        "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("sc_out")
      .outputMode("append").start()
    mem.addData(("a", 1000L), ("a", 6000L))
    q.processAllAvailable()
    mem.addData(("a", 60000L)) // advance watermark to close early windows
    q.processAllAvailable()
    mem.addData(("a", 120000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sc_out")
      .select("window_start_ms", "n").as[(Long, Long)].collect().toMap
    assert(got.get(0L) == Some(2L))     // [0,10s) saw both
    assert(got.get(5000L) == Some(1L))  // [5s,15s) saw 6000 only
  }

  test("sessionCounts merges gap-adjacent events") {
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDS().toDF("k", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.sessionCounts(df, Seq("k"), "ts", "1 second", "5 seconds")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    mem.addData(("a", 1000L), ("a", 3000L), ("a", 20000L))
    q.processAllAvailable()
    mem.addData(("a", 90000L))
    q.processAllAvailable()
    mem.addData(("a", 180000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sw_out")
      .select("session_start_ms", "n_events").as[(Long, Long)].collect().toMap
    assert(got.get(1000L) == Some(2L)) // 1000+3000 merged (gap < 5s)
    assert(got.get(20000L) == Some(1L))
  }
}
