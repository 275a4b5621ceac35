package graft.streaming

import graft.SparkSpec
import SessionCogroupTws.{advance, FlatSession, SessEv}

/** The pure per-key session-cogroup transition, case by case — the
  * watermark-determinism contract StreamingFlagshipSpec exercises
  * end-to-end: sessions form on ORIGINAL event time, close only when no
  * extender can still arrive (last + gap + ooo ≤ wm), replayed
  * micro-batches dedupe, and the closed set is always a time-ordered
  * prefix. */
class SessionCogroupTwsSpec extends SparkSpec {

  private val K = (0L, "u1", "i1")
  private val Gap = 1000L
  private val Ooo = 500L

  private def ev(isImp: Boolean, id: String, ts: Long) = SessEv(isImp, id, ts)
  private def sig(s: FlatSession) =
    (s.sessionStartMs, s.nImps, s.nActs, s.impIds, s.actIds)

  test("nothing closes while an extender could still arrive") {
    // last = 1000; extender bound = last + gap = 2000; an event with
    // ts 2000 can arrive while wm < 2500 — so the session holds at 2499
    val (out, st) = advance(K, Seq(ev(true, "m1", 1000L)), Nil,
      wm = 2499L, Gap, Ooo)
    assert(out.isEmpty && st.size == 1)
    // at exactly last + gap + ooo the session is final
    val (out2, st2) = advance(K, Nil, st, wm = 2500L, Gap, Ooo)
    assert(out2.map(sig) == Seq((1000L, 1L, 0L, "m1", "")) && st2.isEmpty)
  }

  test("gap boundary: diff == gap merges, diff > gap splits") {
    val evs = Seq(ev(true, "m1", 1000L), ev(false, "a1", 2000L), // diff == gap
      ev(false, "a2", 3001L)) // diff 1001 > gap
    val (out, st) = advance(K, evs, Nil, wm = 100000L, Gap, Ooo)
    assert(st.isEmpty)
    assert(out.map(sig) == Seq(
      (1000L, 1L, 1L, "m1", "a1"),
      (3001L, 0L, 1L, "", "a2")))
  }

  test("closure is a prefix: an open tail session holds its events") {
    val evs = Seq(ev(true, "m1", 1000L), ev(true, "m2", 5000L))
    // wm closes session 1 (1000+1000+500 ≤ 4000) but not session 2
    val (out, st) = advance(K, evs, Nil, wm = 4000L, Gap, Ooo)
    assert(out.map(sig) == Seq((1000L, 1L, 0L, "m1", "")))
    assert(st == List(ev(true, "m2", 5000L)))
  }

  test("a late extender merges into the still-open session") {
    val (_, st) = advance(K, Seq(ev(true, "m1", 1000L)), Nil, 1200L, Gap, Ooo)
    // event-time 1800 arrives later (within ooo of the watermark) and
    // extends; the merged session closes as ONE
    val (out, st2) = advance(K, Seq(ev(false, "a1", 1800L)), st, 1900L, Gap, Ooo)
    assert(out.isEmpty)
    val (out2, _) = advance(K, Nil, st2, 10000L, Gap, Ooo)
    assert(out2.map(sig) == Seq((1000L, 1L, 1L, "m1", "a1")))
  }

  test("replayed micro-batches dedupe by (side, id)") {
    val e = Seq(ev(true, "m1", 1000L), ev(false, "a1", 1500L))
    val (_, st) = advance(K, e, Nil, 0L, Gap, Ooo)
    val (out, _) = advance(K, e ++ e, st, 100000L, Gap, Ooo) // full replay
    assert(out.map(sig) == Seq((1000L, 1L, 1L, "m1", "a1")))
  }

  test("member id lists sort by (ts, id) within each side") {
    val evs = Seq(ev(true, "m9", 1100L), ev(true, "m2", 1100L),
      ev(true, "m5", 1000L), ev(false, "a2", 1200L), ev(false, "a1", 1300L))
    val (out, _) = advance(K, evs, Nil, 100000L, Gap, Ooo)
    assert(out.map(sig) == Seq((1000L, 3L, 2L, "m5,m2,m9", "a2,a1")))
  }

  test("batch mode (wm = MaxValue) closes everything and stamps event time") {
    val evs = Seq(ev(true, "m1", 1000L), ev(false, "a1", 5000L))
    val (out, st) = advance(K, evs, Nil, Long.MaxValue, Gap, Ooo)
    assert(st.isEmpty && out.size == 2)
    assert(out.map(_.emittedAt.getTime) == Seq(1000L, 5000L))
  }

  test("streaming stamps clamp above the watermark") {
    val (out, _) = advance(K, Seq(ev(true, "m1", 1000L)), Nil, 50000L, Gap, Ooo)
    assert(out.head.emittedAt.getTime == 50001L) // max(lastTs, wm+1)
  }

  test("empty inputs are no-ops") {
    assert(advance(K, Nil, Nil, 100000L, Gap, Ooo) == ((Nil, Nil)))
  }
}
