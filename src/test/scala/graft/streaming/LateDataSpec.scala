package graft.streaming

import graft.SparkSpec
import graft.schema.JoinSideEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** §2.10 watermark/lateness behavior: what happens to events that arrive
  * after the watermark passed them (reference LATE_EVENTS_TAG semantics).
  * Spark drops late rows at the watermark operator; stateful operators in
  * this library route unmatched/expired work to explicit side channels
  * instead of losing it silently — pinned here. */
class LateDataSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("keepFirstRows: duplicate arriving within the watermark still dedupes") {
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDS().toDF("k", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val q = StreamOps.keepFirstRows(df, Seq("k"), "ts", "10 seconds")
      .writeStream.format("memory").queryName("late_kfr")
      .outputMode("append").start()
    mem.addData(("a", 10000L)); q.processAllAvailable()
    mem.addData(("a", 5000L)) // older duplicate, within 10s watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("late_kfr").count() == 1)
  }

  test("inferred join: RHS past its resolution point lands in the dropped channel, not nowhere") {
    val mem = MemoryStream[JoinSideEvent]
    val q = InferredJoin.joinStream(mem.toDS(), "1 second", 10000L, 1000L)
      .writeStream.format("memory").queryName("late_ij")
      .outputMode("append").start()
    // watermark races ahead; an FK-less RHS with no LHS candidate resolves
    // as "dropped" (the auditable side channel) once its wait expires
    mem.addData(JoinSideEvent(1L, "u", 1, "orphan", "", 5000L))
    q.processAllAvailable()
    mem.addData(JoinSideEvent(1L, "w", 0, "wm1", "", 60000L))
    q.processAllAvailable()
    mem.addData(JoinSideEvent(1L, "w", 0, "wm2", "", 120000L))
    q.processAllAvailable()
    q.stop()
    val dropped = spark.table("late_ij")
      .where(col("matchType") === "dropped").count()
    assert(dropped == 1)
  }
}
