package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The one-shuffle funnel must reproduce a sequential greedy-earliest
  * reference on both a hand fixture (edge semantics) and the real events
  * table. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def refTimes(evs: Seq[(String, Long)], windowMs: Long)
      : (Seq[Option[Long]], Long) = {
    val t = Array.fill[Option[Long]](stages.size)(None)
    t(0) = evs.filter(_._1 == stages.head).map(_._2).minOption
    for (i <- 1 until stages.size) {
      t(i) = t(i - 1).flatMap { prev =>
        evs.filter { case (et, ts) =>
          et == stages(i) && ts > prev && ts <= t(0).get + windowMs
        }.map(_._2).minOption
      }
    }
    (t.toSeq, t.count(_.isDefined).toLong)
  }

  test("edge semantics: strict order, window cut, missing stages") {
    val w = 1000L
    val evs = Seq(
      // u1: clean traversal
      ("u1", "view", 100L), ("u1", "click", 200L), ("u1", "purchase", 300L),
      // u2: click BEFORE the first view never counts; the later one does
      ("u2", "click", 50L), ("u2", "view", 100L), ("u2", "click", 150L),
      // u3: purchase outside the window of t1
      ("u3", "view", 0L), ("u3", "click", 10L), ("u3", "purchase", 2000L),
      // u4: equal timestamp does not advance (strictly after)
      ("u4", "view", 100L), ("u4", "click", 100L),
      // u5: no view at all → absent from output
      ("u5", "click", 10L), ("u5", "purchase", 20L))
    val df = evs.toDF("u", "et", "ts")
    val got = Funnel.funnelTimes(df, "u", "et", "ts", stages, w)
      .collect().map(r => r.getString(0) ->
        ((1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
          r.getLong(4))).toMap
    assert(!got.contains("u5"))
    evs.map(_._1).distinct.filter(_ != "u5").foreach { u =>
      val exp = refTimes(evs.filter(_._1 == u).map(t => (t._2, t._3)), w)
      assert(got(u) == ((exp._1, exp._2)), s"user $u")
    }
    assert(got("u1")._2 == 3L)
    assert(got("u2")._1(1).contains(150L))
    assert(got("u3")._2 == 2L)
    assert(got("u4")._2 == 1L)
  }

  test("matches the sequential reference on the real events table") {
    val w = 7L * 86400000L
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
    val byUser = ev.select("user_id", "event_type", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val got = Funnel.funnelTimes(ev, "user_id", "event_type", "ts_ms", stages, w)
      .collect().map(r => r.getLong(0) ->
        ((1 to 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))),
          r.getLong(4))).toMap
    val exp = byUser.flatMap { case (u, evs) =>
      val r = refTimes(evs.map(t => (t._2, t._3)).toSeq, w)
      if (r._1.head.isDefined) Some(u -> ((r._1, r._2))) else None
    }
    assert(got == exp)
    assert(got.nonEmpty && got.values.exists(_._2 == 3L))
  }

  test("rollup over a corpus with no stage-1 events yields zeros, not nulls") {
    val df = Seq(("u1", "click", 10L), ("u2", "purchase", 20L)).toDF("u", "et", "ts")
    val counts = Funnel.funnelCounts(df, "u", "et", "ts", stages, 1000L)
      .orderBy("stage").collect()
    assert(counts.forall(!_.isNullAt(2)))
    assert(counts.forall(_.getLong(2) == 0L))
  }

  test("stage rollup counts are monotone non-increasing") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
    val counts = Funnel.funnelCounts(ev, "user_id", "event_type", "ts_ms",
        stages, 7L * 86400000L)
      .orderBy("stage").collect().map(_.getLong(2))
    assert(counts.length == 3)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), counts.toSeq)
  }

  test("transition matrix counts every consecutive hop with exact probs") {
    // user 1: a→b→b→c; user 2: a→b (tie at t=10 broken by id: 20 before 21)
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "b"), (1L, 4L, 4L, "c"),
      (2L, 10L, 21L, "b"), (2L, 10L, 20L, "a"))
      .toDF("u", "ts", "id", "et")
    val got = Funnel.transitions(ev, "u", "ts", "et", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // a→b ×2 (prob 1.0 of a's hops), b→b ×1, b→c ×1 (each 1/2 of b's)
    assert(got == Map(
      ("a", "b") -> ((2L, 1000000L)),
      ("b", "b") -> ((1L, 500000L)),
      ("b", "c") -> ((1L, 500000L))))
  }

  test("pathTrigrams: gap-bounded triples with deterministic tie order") {
    // user 1: a(0) b(10) c(20) d(2000) — trigram abc in-gap; bcd blocked
    // by the 100ms gap bound on the second hop
    val ev = Seq(
      (1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 20L, 3L, "c"),
      (1L, 2000L, 4L, "d"),
      // user 2: tie at ts 5 ordered by id → a,b then c
      (2L, 5L, 11L, "a"), (2L, 5L, 12L, "b"), (2L, 6L, 13L, "c"))
      .toDF("u", "ts", "id", "et")
    val got = Funnel.pathTrigrams(ev, "u", "ts", "et", "id", maxGapMs = 100L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == Map(("a", "b", "c") -> 2L))
  }

  test("transitions are partition-invariant") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
    def run(parts: Int) = Funnel
      .transitions(ev.repartition(parts), "user_id", "ts_ms", "event_type",
        "event_id")
      .orderBy("from_type", "to_type").collect().toSeq
    assert(run(1) == run(9))
  }
}
