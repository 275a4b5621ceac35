package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import RedundantReduceTws._

/** Direct checks of the D3 `advance` transition (root election, redundant
  * tagging, action re-pointing, dangling release, replace-TTL, state
  * expiry) — the per-key model the streaming processor and the chained
  * parity spec both ride on. Pure function, no Spark session needed. */
class RedundantReduceTwsSpec extends AnyFunSuite {

  private val Key = (1L, "u1")
  private val Ooo = 100L
  private val Replace = 10000L
  private val Cleanup = 5000L

  private def imp(iid: String, mid: String, ts: Long) =
    TinyJoined(1L, "u1", iid, mid, "", "", ts, new java.sql.Timestamp(ts))
  private def act(mid: String, aid: String, ts: Long, content: String = "") =
    TinyJoined(1L, "u1", "", mid, aid, content, ts, new java.sql.Timestamp(ts))

  private def run(events: Seq[TinyJoined], wm: Long = Long.MaxValue,
      st: ReduceState = emptyReduceState) =
    advance(Key, events, st, wm, Ooo, Replace, Cleanup)

  /** (kind, insertionId, impressionId, actionId) — emittedAt varies by
    * harness, tsMs rides along unchanged. */
  private def sig(out: Seq[Reduced]) =
    out.map(r => (r.kind, r.insertionId, r.impressionId, r.actionId)).toSet

  test("root election tie breaks on (ts, impressionId) — min id wins") {
    val (out, st) = run(Seq(imp("i1", "mB", 1000), imp("i1", "mA", 1000)))
    assert(sig(out) == Set(("impression", "i1", "mA", ""),
      ("redundant", "i1", "mB", "")))
    assert(st.roots("i1") == ((1000L, "mA")))
  }

  test("election is event-time deterministic, not arrival-order") {
    // the later-ts impression arrives FIRST, in an earlier advance call;
    // neither ripens before the final call, so the election sees both and
    // picks the event-time min — first-ARRIVAL (the reference's) would
    // have picked mLate
    val (o1, s1) = run(Seq(imp("i1", "mLate", 2000)), wm = 900)
    assert(o1.isEmpty && s1.pendImps.nonEmpty)
    val (o2, s2) = run(Seq(imp("i1", "mEarly", 1000)), wm = 1050, st = s1)
    assert(o2.isEmpty) // 1000+100 > 1050: mEarly's reorder window still open
    val (o3, s3) = run(Seq.empty, wm = 3000, st = s2)
    assert(sig(o3) == Set(("impression", "i1", "mEarly", ""),
      ("redundant", "i1", "mLate", "")))
    assert(s3.roots("i1") == ((1000L, "mEarly")))
  }

  test("actions re-point to the root, including via a redundant impression") {
    val (out, _) = run(Seq(
      imp("i1", "m1", 1000), imp("i1", "m2", 1500),
      act("m1", "a1", 2000), // direct hit on the root
      act("m2", "a2", 2500, content = "C7"))) // via the redundant imp
    assert(sig(out) == Set(
      ("impression", "i1", "m1", ""), ("redundant", "i1", "m2", ""),
      ("action", "i1", "m1", "a1"), ("action", "i1", "m1", "a2")))
    assert(out.find(_.actionId == "a2").get.contentId == "C7")
  }

  test("an impression past replaceTtl REPLACES the root; later actions follow it") {
    val t2 = 1000 + Replace + 1
    val (o1, s1) = run(Seq(imp("i1", "m1", 1000), act("m1", "a1", 1200)))
    val (o2, _) = run(Seq(imp("i1", "m9", t2), act("m1", "a2", t2 + 10)), st = s1)
    assert(sig(o1) == Set(("impression", "i1", "m1", ""),
      ("action", "i1", "m1", "a1")))
    // m9 is a fresh root, not a redundant; a2 re-points to it even though
    // it referenced m1 (the reference's replaceReducedImpressionAfter path)
    assert(sig(o2) == Set(("impression", "i1", "m9", ""),
      ("action", "i1", "m9", "a2")))
  }

  test("within replaceTtl a later impression stays redundant") {
    val (out, _) = run(Seq(imp("i1", "m1", 1000), imp("i1", "m2", 1000 + Replace)))
    assert(sig(out) == Set(("impression", "i1", "m1", ""),
      ("redundant", "i1", "m2", "")))
  }

  test("unmatched action holds until cleanup, then releases as dangling") {
    val (o1, s1) = run(Seq(act("mGhost", "a1", 1000)), wm = 1000 + Cleanup - 1)
    assert(o1.isEmpty && s1.pendActs.nonEmpty)
    val (o2, s2) = run(Seq.empty, wm = 1000 + Cleanup, st = s1)
    assert(sig(o2) == Set(("dangling", "", "mGhost", "a1")))
    assert(s2 == emptyReduceState) // nothing left behind
  }

  test("late action against a kept root resolves until 2x cleanup, then dangles") {
    val (_, s1) = run(Seq(imp("i1", "m1", 1000)), wm = 2000)
    // root is kept for 2x cleanup (the reference's '2 * ttl' hold for late
    // redundant-impression actions): an action inside that horizon re-points
    val (o2, s2) = run(Seq(act("m1", "aLate", 9000)), wm = 9500, st = s1)
    assert(sig(o2) == Set(("action", "i1", "m1", "aLate")))
    // beyond 2x cleanup the maps expire; the same reference now dangles
    val (_, s3) = run(Seq.empty, wm = 1000 + 2 * Cleanup, st = s2)
    assert(s3.roots.isEmpty && s3.midToIns.isEmpty)
    val (o4, _) = run(Seq(act("m1", "aExpired", 12000)),
      wm = 12000 + Cleanup, st = s3)
    assert(sig(o4) == Set(("dangling", "", "m1", "aExpired")))
  }

  test("replayed impressions FIFO-dedupe by id") {
    val (_, s1) = run(Seq(imp("i1", "m1", 1000)), wm = 2000)
    val (o2, s2) = run(Seq(imp("i1", "m1", 1000)), wm = 3000, st = s1) // replay
    assert(o2.isEmpty)
    assert(s2.midToIns.size == 1)
  }

  test("batch stamp is the event time; streaming stamp never lags the watermark") {
    val (batch, _) = run(Seq(imp("i1", "m1", 1000)))
    assert(batch.head.emittedAt.getTime == 1000L)
    val (stream, _) = run(Seq(imp("i1", "m1", 1000)), wm = 4000)
    assert(stream.head.emittedAt.getTime == 4001L)
  }

  test("incremental watermark advance emits exactly the batch result (randomized)") {
    val rnd = new scala.util.Random(4242L)
    for (trial <- 1 to 40) {
      val imps = (1 to 1 + rnd.nextInt(6)).map(i =>
        imp(s"i${rnd.nextInt(3)}", s"m$i", 1000L + rnd.nextInt(4000)))
      val mids = imps.map(_.impressionId) :+ "mGhost"
      val acts0 = (1 to rnd.nextInt(4)).map(i =>
        act(mids(rnd.nextInt(mids.size)), s"a$i", 1000L + rnd.nextInt(6000)))
      val events = rnd.shuffle(imps ++ acts0)
      val (batch, _) = run(events)
      // honor the watermark contract the streaming harness provides: when
      // wm = W every event with ts <= W has been delivered. Slices are
      // event-time contiguous with arrival order shuffled INSIDE each
      // (disorder within the slack); wm ratchets to each slice's max ts
      val slices = events.sortBy(_.tsMs)
        .grouped(math.max(1, events.size / 3 + 1)).toSeq
      var st = emptyReduceState
      val got = Seq.newBuilder[Reduced]
      slices.foreach { sl =>
        val (o, n) = run(rnd.shuffle(sl), sl.map(_.tsMs).max, st)
        got ++= o; st = n
      }
      // final flush at a large FINITE watermark: everything ripens, every
      // pending action resolves or dangles, and the 2x-cleanup TTL then
      // empties the lookup maps (MaxValue is batch mode, which keeps them)
      val (oF, stF) = run(Seq.empty, 100000000L, st)
      got ++= oF
      assert(sig(got.result()) == sig(batch), s"trial $trial: $events")
      assert(stF == emptyReduceState, s"trial $trial left state: $stF")
    }
  }
}
