package graft.operators

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (user, id, ts, type)
  private val events = Seq(
    ("u1", 1L, 1000L, "click"),
    ("u1", 2L, 2000L, "click"),
    ("u1", 3L, 5000L, "purchase"),   // credits click 2 (latest earlier)
    ("u1", 4L, 5000L, "click"),      // same-ts click must NOT be credited
    ("u1", 5L, 5000L, "purchase"),   // still credits click 2
    ("u1", 6L, 900000L, "purchase"), // beyond 10s lookback → unattributed
    ("u2", 7L, 3000L, "purchase"),   // no click ever → unattributed
    ("u3", 8L, 4000L, "click"),
    ("u3", 9L, 4000L, "click"),      // tie: same user+ts, min id wins
    ("u3", 10L, 6000L, "purchase"))

  test("latest strictly-earlier touch wins; ties break to min id; lookback gates") {
    val got = Attribution.lastTouch(
        events.toDF("user_id", "event_id", "ts_ms", "event_type"),
        "user_id", "event_id", "ts_ms", "event_type",
        touchType = "click", convType = "purchase", lookbackMs = 10000L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got(3L) == ((2L, 2000L, 3000L, true)))
    assert(got(5L) == ((2L, 2000L, 3000L, true)),
      "the same-timestamp click must be invisible to the purchase")
    assert(got(6L) == ((-1L, -1L, -1L, false)), "outside the lookback")
    assert(got(7L) == ((-1L, -1L, -1L, false)), "no touch at all")
    assert(got(10L) == ((8L, 4000L, 2000L, true)), "tie resolves to min id")
    assert(got.size == 5, "every conversion emits exactly one row")
  }

  test("linear shares deal exactly 1e6 ppm per conversion, remainder to latest") {
    val got = Attribution.linearTouch(
        events.toDF("user_id", "event_id", "ts_ms", "event_type"),
        "user_id", "event_id", "ts_ms", "event_type",
        "click", "purchase", lookbackMs = 10000L)
      .collect().map(r => (r.getLong(1), r.getLong(3)) -> r.getLong(5)).toMap
    // purchase 3 (u1): touches 1, 2 → 500000 each
    assert(got((3L, 1L)) == 500000L && got((3L, 2L)) == 500000L)
    // purchase 5 (u1, ts 5000): touches 1, 2 only (click 4 at the same ts
    // is NOT strictly earlier)
    assert(got((5L, 1L)) == 500000L && got((5L, 2L)) == 500000L)
    assert(!got.contains((5L, 4L)))
    // purchase 10 (u3): 3 in-window touches? only ids 8, 9 at ts 4000 →
    // 500000 each; purchase 6/7 out of window/no touches → absent
    assert(got((10L, 8L)) == 500000L && got((10L, 9L)) == 500000L)
    assert(!got.keys.exists(_._1 == 6L) && !got.keys.exists(_._1 == 7L))
    // remainder: 3 touches split 333333 + remainder 1 to the latest
    val three = Seq(("w", 1L, 100L, "click"), ("w", 2L, 200L, "click"),
      ("w", 3L, 300L, "click"), ("w", 4L, 400L, "purchase"))
    val g3 = Attribution.linearTouch(
        three.toDF("user_id", "event_id", "ts_ms", "event_type"),
        "user_id", "event_id", "ts_ms", "event_type",
        "click", "purchase", 10000L)
      .collect().map(r => r.getLong(3) -> r.getLong(5)).toMap
    assert(g3 == Map(3L -> 333334L, 2L -> 333333L, 1L -> 333333L))
    assert(g3.values.sum == 1000000L)
  }

  test("positionTouch: U-shaped shares sum to exactly 1e6") {
    def run(events: Seq[(String, Long, Long, String)]) =
      Attribution.positionTouch(
        events.toDF("user_id", "event_id", "ts_ms", "event_type"),
        "user_id", "event_id", "ts_ms", "event_type",
        "click", "purchase", lookbackMs = 10000L)
        .collect().map(r => (r.getLong(1), r.getLong(3)) -> r.getLong(7)).toMap
    // 1 touch → full credit
    val one = run(Seq(("u", 1L, 100L, "click"), ("u", 9L, 500L, "purchase")))
    assert(one == Map((9L, 1L) -> 1000000L))
    // 2 touches → 50/50
    val two = run(Seq(("u", 1L, 100L, "click"), ("u", 2L, 200L, "click"),
      ("u", 9L, 500L, "purchase")))
    assert(two == Map((9L, 1L) -> 500000L, (9L, 2L) -> 500000L))
    // 5 touches → 400000 / 66666 / 66666 / 66666+2 / 400000 by position
    val five = run(Seq(("u", 1L, 100L, "click"), ("u", 2L, 200L, "click"),
      ("u", 3L, 300L, "click"), ("u", 4L, 400L, "click"),
      ("u", 5L, 500L, "click"), ("u", 9L, 900L, "purchase")))
    assert(five((9L, 1L)) == 400000L && five((9L, 5L)) == 400002L)
    assert(five((9L, 2L)) == 66666L && five((9L, 3L)) == 66666L &&
      five((9L, 4L)) == 66666L)
    assert(five.values.sum == 1000000L)
  }

  test("attribution is partition-invariant") {
    val big = (0L until 600L).map { i =>
      val et = if (i % 3 == 0) "purchase" else "click"
      (s"u${i % 7}", i, (i * 97) % 10000, et)
    }
    def run(parts: Int) = Attribution.lastTouch(
        big.toDF("user_id", "event_id", "ts_ms", "event_type")
          .repartition(parts),
        "user_id", "event_id", "ts_ms", "event_type",
        "click", "purchase", 5000L)
      .orderBy("conv_id").collect().toSeq
    assert(run(1) == run(13))
  }

  test("shapleyChannels: single channel gets the whole marginal lift") {
    // 4 users: two saw 'a' (one converted), two saw nothing (none
    // converted): v({a}) = 500000, v(∅) = 0 → φ_a·1!·e6 = 500000
    val rows = Seq(
      (1L, "a"), (1L, "buy"), (2L, "a"),
      (3L, "x"), (4L, "x"))
    val got = Attribution.shapleyChannels(rows.toDF("u", "t"), "u", "t",
      Seq("a"), "buy").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("phi_x1_e6") == 500000L)
  }

  test("shapleyChannels: symmetric channels split credit equally; efficiency holds") {
    // masks: {} 2 users 0 conv; {a} 2 users 1 conv; {b} 2 users 1 conv;
    // {a,b} 2 users 2 conv → v = 0, .5, .5, 1 — symmetric in a/b
    val rows = Seq(
      (1L, "z"), (2L, "z"),
      (3L, "a"), (3L, "buy"), (4L, "a"),
      (5L, "b"), (5L, "buy"), (6L, "b"),
      (7L, "a"), (7L, "b"), (7L, "buy"),
      (8L, "a"), (8L, "b"), (8L, "buy"))
    val got = Attribution.shapleyChannels(rows.toDF("u", "t"), "u", "t",
      Seq("a", "b"), "buy").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("phi_x2_e6")).toMap
    assert(got("a") == got("b"))
    // efficiency: Σφ·n!·e6 = n!·(v(N) − v(∅))·e6 = 2·(1e6 − 0)
    assert(got("a") + got("b") == 2000000L)
  }

  test("markovRemoval solves the hand chain exactly") {
    // u1: a→buy, u2: a→(null), u3: b→buy
    // chain: START→{a:2, b:1}; a→{CONV:1, NULL:1}; b→{CONV:1}
    // v(a)=5e8, v(b)=1e9, v(START)=(2·5e8+1e9) div 3 = 666666666
    // remove a: START→{NULL:2, b:1} → 333333333; remove b symmetric
    val rows = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "buy"),
      (2L, 3L, 10L, "a"),
      (3L, 4L, 10L, "b"), (3L, 5L, 20L, "buy"))
    val got = Attribution.markovRemoval(rows.toDF("u", "i", "ts", "t"),
      "u", "i", "ts", "t", Seq("a", "b"), "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((666666666L, 333333333L, 500000L)))
    assert(got("b") == ((666666666L, 333333333L, 500000L)))
  }

  test("markovRemoval: touchless converters keep START→CONV mass") {
    // one user converts with no touches, one touches a and converts:
    // base = (1·v(a) + 1·1e9) div 2 with v(a)=1e9 → 1e9;
    // removing a: START→{NULL:1, CONV:1} → 5e8 → removal 500000
    val rows = Seq(
      (1L, 1L, 10L, "buy"),
      (2L, 2L, 10L, "a"), (2L, 3L, 20L, "buy"))
    val got = Attribution.markovRemoval(rows.toDF("u", "i", "ts", "t"),
      "u", "i", "ts", "t", Seq("a"), "buy").collect().head
    assert(got.getLong(1) == 1000000000L)
    assert(got.getLong(2) == 500000000L)
    assert(got.getLong(3) == 500000L)
  }

  test("shapleyChannels on events is partitioning-invariant") {
    val rows = (1L to 300L).flatMap { i =>
      val types = Seq("a", "b", "c").filter(t => (i + t.hashCode) % 3 != 0)
      types.map(t => (i, t)) ++
        (if (i % 4 == 0) Seq((i, "buy")) else Nil)
    }
    def run(parts: Int) = Attribution.shapleyChannels(
      rows.toDF("u", "t").repartition(parts), "u", "t",
      Seq("a", "b", "c"), "buy").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("phi_x6_e6")).toMap
    assert(run(1) == run(11))
  }
}
