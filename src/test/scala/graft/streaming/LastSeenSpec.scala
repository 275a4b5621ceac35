package graft.streaming

import graft.SparkSpec
import graft.streaming.LastSeen._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** LastTimeAndCount streaming semantics (LastTimeAndCount.java:29-290):
  * per-event emission of (lastTs, live count), TTL decrement via spread
  * timers, hash-seeded offset bounds. */
class LastSeenSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private val Day = 86400000L

  test("each event emits the running (lastTs, count)") {
    val (out, st) = advance("k", Seq(Event("k", 100L), Event("k", 50L),
      Event("k", 200L)), State(0L, Map.empty, 0L), Long.MinValue, 90)
    // processed in ts order; count grows per event
    assert(out.map(r => (r.lastTsMs, r.count)) ==
      Seq((50L, 1L), (100L, 2L), (200L, 3L)))
    assert(out.map(_.seq) == Seq(1L, 2L, 3L)) // monotone emission sequence
    assert(st.dayCounts == Map(0L -> 3L))
  }

  test("day buckets decrement after the TTL and re-emit the shrunk count") {
    val d0 = 0L; val d50 = 50L * Day
    val (_, st) = advance("k", Seq(Event("k", d0 + 10L)),
      State(0L, Map.empty, 0L), Long.MinValue, 90)
    val (out2, st2) = advance("k", Seq(Event("k", d50)), st,
      Long.MinValue, 90)
    assert(out2.last.count == 2L) // both days live at day 50
    // watermark far past day0's cleanup (day0 + 91d + offset < 93d)
    val (out3, st3) = advance("k", Nil, st2, 93L * Day, 90)
    assert(out3.map(_.count) == Seq(1L)) // day0 dropped, refresh emitted
    assert(st3.dayCounts == Map(d50 -> 1L))
    // the decay emission outranks every earlier one: latest-wins sinks
    // ordering on seq deliver the shrunken count, not the stale maximum
    assert(out3.head.seq > out2.map(_.seq).max)
  }

  test("timer offset is deterministic and within [0, 1 day)") {
    val offs = Seq("a", "b", "c", "hot-user").map(k =>
      pseudoRandomOffsetMs(k.hashCode))
    assert(offs == Seq("a", "b", "c", "hot-user").map(k =>
      pseudoRandomOffsetMs(k.hashCode))) // deterministic
    assert(offs.forall(o => o >= 0L && o < Day))
    assert(offs.distinct.size > 1) // actually spreads
  }

  test("streaming emits per event and decays after watermark passes TTL") {
    val mem = MemoryStream[Event]
    val q = countStream(mem.toDS(), "1 second", ttlDays = 2)
      .writeStream.format("memory").queryName("last_seen_stream")
      .outputMode("append").start()
    mem.addData(Event("u", 1000L), Event("u", 2000L))
    q.processAllAvailable()
    mem.addData(Event("zz", 10L * Day)) // watermark past u's cleanup
    q.processAllAvailable()
    mem.addData(Event("zz", 11L * Day)) // fire u's timeout
    q.processAllAvailable()
    q.stop()
    val got = spark.table("last_seen_stream").as[Result].collect()
      .filter(_.key == "u").map(r => (r.lastTsMs, r.count)).toList
    // two per-event emissions, then the timer-driven decay to 0
    assert(got.take(2) == List((1000L, 1L), (2000L, 2L)))
    assert(got.last == ((2000L, 0L)))
  }
}
