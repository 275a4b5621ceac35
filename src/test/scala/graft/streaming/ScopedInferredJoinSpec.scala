package graft.streaming

import graft.SparkSpec
import graft.schema.ScopedEvent

/** Scoped-cascade semantics of the inferred join (BaseInferred.java:524-547,
  * ContentId.java:64-95): scope order, content filter, right-outer, and the
  * prefer-later tie rule — pinned at the pure `advanceScoped` level. */
class ScopedInferredJoinSpec extends SparkSpec {

  private val key = (0L, "lu")
  private def lhs(id: String, ts: Long, scopes: Seq[String],
      contents: Seq[String] = Nil) =
    ScopedEvent(0L, "lu", 0, id, "", ts, scopes, contents)
  private def rhs(id: String, ts: Long, fk: String = "",
      scopes: Seq[String] = Nil, contents: Seq[String] = Nil) =
    ScopedEvent(0L, "lu", 1, id, fk, ts, scopes, contents)

  private def run(events: Seq[ScopedEvent], rightOuter: Boolean = false,
      maxTime: Long = 1000L, ooo: Long = 10L) =
    InferredJoin.advanceScoped(key, events, InferredJoin.emptyScopedState,
      Long.MaxValue, maxTime, ooo, rightOuter)._1
      .map(p => p.rightId -> (p.leftId, p.matchType)).toMap

  test("first scope with a candidate wins, even if a later scope is closer") {
    val out = run(Seq(
      lhs("L1", 100L, Seq("reqA")),
      lhs("L2", 490L, Seq("viewB")), // closer in time but second scope
      rhs("R", 500L, scopes = Seq("reqA", "viewB"))))
    assert(out("R") == (("L1", "inferred")))
  }

  test("blank and unknown scopes are skipped; cascade falls through") {
    val out = run(Seq(
      lhs("L2", 490L, Seq("viewB")),
      rhs("R", 500L, scopes = Seq("", "nonexistent", "viewB"))))
    assert(out("R") == (("L2", "inferred")))
  }

  test("content filter: candidates must share a content id when RHS has one") {
    val out = run(Seq(
      lhs("L1", 499L, Seq("s"), Seq("c1")), // closest but wrong content
      lhs("L2", 400L, Seq("s"), Seq("c2")),
      rhs("R", 500L, scopes = Seq("s"), contents = Seq("c2"))))
    assert(out("R") == (("L2", "inferred")))
    // no content match anywhere in the scope → dropped
    val dropped = run(Seq(
      lhs("L1", 499L, Seq("s"), Seq("c1")),
      rhs("R", 500L, scopes = Seq("s"), contents = Seq("c9"))))
    assert(dropped("R")._2 == "dropped")
  }

  test("equal-distance tie goes to the later event (BaseInferred.java:632)") {
    val out = run(Seq(
      lhs("L-early", 495L, Seq("s")),
      lhs("L-late", 505L, Seq("s")),
      rhs("R", 500L, scopes = Seq("s"))))
    assert(out("R") == (("L-late", "inferred")))
  }

  test("right-outer emits unmatched RHS with an empty left") {
    val out = run(Seq(rhs("R", 500L, scopes = Seq("s"))), rightOuter = true)
    assert(out("R") == (("", "outer")))
    // also for expired exact-FK waiters
    val out2 = run(Seq(rhs("R2", 500L, fk = "nope")), rightOuter = true)
    assert(out2("R2") == (("", "outer")))
  }

  test("exact FK beats every scope and skips the content filter") {
    val out = run(Seq(
      lhs("L1", 100L, Seq("s"), Seq("c1")),
      lhs("L2", 499L, Seq("s"), Seq("c2")),
      rhs("R", 500L, fk = "L1", scopes = Seq("s"), contents = Seq("c2"))))
    assert(out("R") == (("L1", "exact")))
  }

  test("watermark TTL prunes lefts and their scope registrations") {
    val (out1, st1) = InferredJoin.advanceScoped(key,
      Seq(lhs("L1", 100L, Seq("s"))), InferredJoin.emptyScopedState,
      watermarkMs = 50L, maxTimeMs = 1000L, outOfOrderMs = 10L, rightOuter = false)
    assert(out1.isEmpty && st1.lefts.contains("L1") && st1.scopeIdx.contains("s"))
    val (_, st2) = InferredJoin.advanceScoped(key, Nil, st1,
      watermarkMs = 2000L, maxTimeMs = 1000L, outOfOrderMs = 10L, rightOuter = false)
    assert(st2.lefts.isEmpty && st2.scopeIdx.isEmpty)
  }
}
