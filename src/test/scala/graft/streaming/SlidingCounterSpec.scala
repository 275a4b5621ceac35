package graft.streaming

import graft.SparkSpec
import graft.schema.WindowAggResult
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SlidingCounterSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("pure transition: counts slide — expired buckets decrement") {
    // emit every 10, window 20; events at t=5 (n=1), t=15 (n=2)
    val (out1, st1) = SlidingCounter.advance("k",
      Seq(SlidingCounter.Event("k", 5L, 1L), SlidingCounter.Event("k", 15L, 2L)),
      SlidingCounter.State(Map.empty, 0L), watermarkMs = 20L,
      emitMs = 10L, windowsMs = Seq(20L))
    // ticks at 10 (bucket 10 → 1) and 20 (buckets 10,20 → 3)
    assert(out1.map(r => r.windowStartMs -> r.count) ==
      Seq(-10L -> 1L, 0L -> 3L))
    // advance far: bucket 10 expires from the 20-window → count drops to 2
    val (out2, _) = SlidingCounter.advance("k", Nil, st1, watermarkMs = 30L,
      emitMs = 10L, windowsMs = Seq(20L))
    assert(out2.map(r => r.windowStartMs -> r.count) == Seq(10L -> 2L))
  }

  test("streaming emission at emit cadence per window size") {
    val mem = MemoryStream[SlidingCounter.Event]
    val q = SlidingCounter.countStream(mem.toDS(), "1 second",
        emitMs = 1000L, windowsMs = Seq(2000L, 4000L))
      .writeStream.format("memory").queryName("slc_out")
      .outputMode("append").start()
    mem.addData(SlidingCounter.Event("a", 500L, 1L),
      SlidingCounter.Event("a", 1500L, 1L))
    q.processAllAvailable()
    mem.addData(SlidingCounter.Event("z", 60000L, 1L)) // advance watermark
    q.processAllAvailable()
    mem.addData(SlidingCounter.Event("z", 120000L, 1L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("slc_out").as[WindowAggResult].collect()
      .filter(_.key == "a")
    // both window sizes emit on each tick
    assert(out.map(_.windowSizeMs).toSet == Set(2000L, 4000L))
    // tick at t=2000, 2s window [0,2000): both events counted
    assert(out.exists(r => r.windowSizeMs == 2000L && r.windowStartMs == 0L && r.count == 2L))
    // later ticks slide the 2s window empty again
    assert(out.exists(r => r.windowSizeMs == 2000L && r.count == 0L))
  }
}
