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

  test("topKeyStream surfaces only keys above the threshold") {
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDS().toDF("qh", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.topKeyStream(df, "qh", "ts", "1 second",
        "10 seconds", "10 seconds", minCount = 3L)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    mem.addData(("hot", 1000L), ("hot", 2000L), ("hot", 3000L),
      ("cold", 1500L))
    q.processAllAvailable()
    mem.addData(("x", 60000L)) // close the window
    q.processAllAvailable()
    q.stop()
    val got = spark.table("topk_out").select("qh").as[String].collect().toSet
    assert(got == Set("hot"))
  }

  test("sessionPayloads matches the batch payload cogroup") {
    import graft.operators.Cogroup
    // (user, ts, id, isLeft)
    val rows = Seq(("u1", 1000L, 11L, 1), ("u1", 2000L, 12L, 0),
      ("u1", 3000L, 13L, 1), ("u1", 20000L, 14L, 0),
      ("u2", 1000L, 21L, 0), ("u2", 2500L, 22L, 1))
    val mem = MemoryStream[(String, Long, Long, Int)]
    val df = mem.toDS().toDF("user_id", "ts_ms", "event_id", "is_left")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.sessionPayloads(df, Seq("user_id"), "ts", "event_id",
        "is_left", "1 second", "5 seconds")
      .writeStream.format("memory").queryName("sp_out")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    mem.addData(("u9", 600000L, 99L, 0)) // advance watermark, close sessions
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sp_out")
      .where(col("user_id") =!= "u9")
      .select("user_id", "session_start_ms", "n_left", "n_right",
        "left_ids", "right_ids")
      .as[(String, Long, Long, Long, String, String)].collect().toSet

    val batchDf = rows.toDF("user_id", "ts_ms", "event_id", "is_left")
    val batch = Cogroup.sessionPayloadCogroup(
        batchDf.where(col("is_left") === 1).select("user_id", "ts_ms", "event_id"),
        batchDf.where(col("is_left") === 0).select("user_id", "ts_ms", "event_id"),
        Seq("user_id"), "ts_ms", 5000L, "event_id", "event_id")
      .select("user_id", "session_start_ms", "n_left", "n_right",
        "left_ids", "right_ids")
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(streamed == batch)
  }
}
