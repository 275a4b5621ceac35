package graft.streaming

import graft.SparkSpec
import graft.schema.{JoinSideEvent, JoinedPair}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class InferredJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private val P = 1L
  private def left(id: String, ts: Long) = JoinSideEvent(P, "u", 0, id, "", ts)
  private def right(id: String, fk: String, ts: Long) = JoinSideEvent(P, "u", 1, id, fk, ts)

  test("batch: exact FK join including out-of-order RHS-before-LHS") {
    val in = Seq(
      right("i1", "v1", 500L), // arrives before its LHS in event time order
      left("v1", 1000L),
      right("i2", "v1", 1500L)).toDS()
    val out = InferredJoin.joinBatch(in, maxTimeMs = 10000L, outOfOrderMs = 1000L)
      .collect().map(p => p.rightId -> (p.leftId, p.matchType)).toMap
    assert(out("i1") == ("v1", "exact"))
    assert(out("i2") == ("v1", "exact"))
  }

  test("batch: missing FK infers temporally-closest LHS within window") {
    val in = Seq(
      left("v1", 1000L), left("v2", 5000L),
      right("i1", "", 4200L), // closer to v2 (800) than v1 (3200)
      right("i2", "", 1100L), // closest v1
      right("i3", "", 90000L)) // nothing within [80000, 91000] → dropped
      .toDS()
    val out = InferredJoin.joinBatch(in, maxTimeMs = 10000L, outOfOrderMs = 1000L)
      .collect().map(p => p.rightId -> (p.leftId, p.matchType)).toMap
    assert(out("i1") == ("v2", "inferred"))
    assert(out("i2") == ("v1", "inferred"))
    assert(out("i3") == ("", "dropped"))
  }

  test("streaming: exact + inferred emission as watermark advances") {
    val mem = MemoryStream[JoinSideEvent]
    val q = InferredJoin.joinStream(mem.toDS(), "1 second",
        maxTimeMs = 10000L, outOfOrderMs = 1000L)
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()

    mem.addData(left("v1", 1000L), right("i1", "v1", 1200L), right("i2", "", 1500L))
    q.processAllAvailable()
    // advance watermark far past i2's resolution point (1500 + 1000)
    mem.addData(left("vLate", 60000L))
    q.processAllAvailable()
    mem.addData(left("vLater", 120000L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ij_out").as[JoinedPair].collect()
      .map(p => p.rightId -> (p.leftId, p.matchType)).toMap
    assert(out("i1") == ("v1", "exact"))
    assert(out("i2") == ("v1", "inferred"))
  }

  test("hot key: 100k pending inference candidates stay linear") {
    import graft.schema.ScopedEvent
    // Worst case for a per-event list scan: every no-FK RHS pk is
    // distinct, so the pending list grows to n and the old
    // `pendingInfer.exists(_.id == …)` dedupe was n²/2 ≈ 5e9 compares
    // (tens of seconds). The set-backed dedupe is O(n) total.
    val n = 100000
    val events = (0 until n).map(i =>
      ScopedEvent(P, "hot", 1, s"r$i", "", 1000L + i, scopes = Seq("hot")))
    val dup = events.take(1000) // and re-sends must still dedupe
    val t0 = System.nanoTime()
    val (pairs, st) = InferredJoin.advanceScoped((P, "hot"), events ++ dup,
      InferredJoin.emptyScopedState, watermarkMs = Long.MinValue,
      maxTimeMs = 10000L, outOfOrderMs = 1000L, rightOuter = false)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pairs.isEmpty) // nothing resolvable below the watermark
    assert(st.pendingInfer.size == n) // duplicates dropped, order kept
    assert(secs < 20.0, f"advanceScoped took $secs%.1f s — dedupe is not linear")
    // and the FIFO winner is the first arrival, as before
    val (resolved, _) = InferredJoin.advanceScoped((P, "hot"), Nil, st,
      watermarkMs = Long.MaxValue, maxTimeMs = 10000L, outOfOrderMs = 1000L,
      rightOuter = false)
    assert(resolved.size == n && resolved.forall(_.matchType == "dropped"))
  }
}
