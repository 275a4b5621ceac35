package graft.streaming

import graft.SparkSpec
import graft.streaming.UserJoin._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Two-tier UserJoin fast-path semantics (UserJoin.java:62-358). */
class UserJoinStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private def upd(k: String, ts: Long, attrs: (String, String)*) =
    In(k, 0, "", ts, attrs.toMap)
  private def ev(k: String, id: String, ts: Long) = In(k, 1, id, ts, Map.empty)

  private val Fast = 100L; private val Max = 10000L

  test("known user joins on the fast tier; later non-empty fields win") {
    val (out, _) = advance("k", Seq(
      upd("k", 10L, "uid" -> "u1", "seg" -> ""),
      upd("k", 20L, "seg" -> "premium"),
      ev("k", "e1", 50L)), emptyJoinState, wmMs = 200L, Fast, Max, 60000L)
    assert(out == Seq(Enriched("k", "e1", 50L,
      Map("uid" -> "u1", "seg" -> "premium"), "fast")))
  }

  test("unknown user waits the full window, then joins late updates (slow)") {
    // watermark passes fast tier with no user → re-buffer
    val (out1, st1) = advance("k", Seq(ev("k", "e1", 50L)), emptyJoinState,
      wmMs = 200L, Fast, Max, 60000L)
    assert(out1.isEmpty && st1.slowPending.nonEmpty)
    // user update arrives (out-of-order, uts <= event ts) before max window
    val (out2, _) = advance("k", Seq(upd("k", 40L, "uid" -> "u9")), st1,
      wmMs = 50L + Max, Fast, Max, 60000L)
    assert(out2 == Seq(Enriched("k", "e1", 50L, Map("uid" -> "u9"), "slow")))
  }

  test("user never arrives → unenriched emission after the max window") {
    val (out, _) = advance("k", Seq(ev("k", "e1", 50L)), emptyJoinState,
      wmMs = 50L + Max + 1, Fast, Max, 60000L)
    assert(out == Seq(Enriched("k", "e1", 50L, Map.empty, "unenriched")))
  }

  test("updates after the event's ts don't apply (as-of semantics)") {
    val (out, _) = advance("k", Seq(
      upd("k", 100L, "uid" -> "future"), ev("k", "e1", 50L)),
      emptyJoinState, wmMs = 50L + Max + 1, Fast, Max, 60000L)
    assert(out.head.path == "unenriched")
  }

  test("streaming matches batch on shared input") {
    val events = Seq(
      upd("a", 1000L, "uid" -> "ua"), ev("a", "a1", 1500L),
      ev("b", "b1", 1000L), upd("b", 900L, "uid" -> "ub"),
      ev("c", "c1", 1000L)) // no user for c
    val batch = joinBatch(events.toDS(), Fast, Max).collect()
      .map(e => e.id -> ((e.attrs, e.path))).toMap
    assert(batch("a1") == ((Map("uid" -> "ua"), "fast")))
    assert(batch("b1") == ((Map("uid" -> "ub"), "fast")))
    assert(batch("c1") == ((Map.empty[String, String], "unenriched")))

    val mem = MemoryStream[In]
    val q = joinStream(mem.toDS(), "1 second", Fast, Max, 60000L)
      .writeStream.format("memory").queryName("uj_stream")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(ev("zz", "z", 600000L)) // push watermark past max windows
    q.processAllAvailable()
    mem.addData(ev("zz2", "z2", 1300000L)) // resolve zz's own window too
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("uj_stream").as[Enriched].collect()
      .filter(e => !e.key.startsWith("zz"))
      .map(e => e.id -> ((e.attrs, e.path))).toMap
    assert(streamed == batch)
  }
}
