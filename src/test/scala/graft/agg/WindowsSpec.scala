package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("slidingCount: each row lands in size/slide epoch-aligned windows") {
    // one event at t=2500 with size=2000, slide=1000 → windows 2000 and 1000
    val df = Seq(("a", 2500L)).toDF("k", "ts_ms")
    val got = Windows.slidingCount(df, Seq("k"), "ts_ms", 2000L, 1000L)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(2000L, 1000L))
  }

  test("slidingCount counts per key and window") {
    val df = Seq(("a", 100L), ("a", 900L), ("b", 100L), ("a", 1100L))
      .toDF("k", "ts_ms")
    val got = Windows.slidingCount(df, Seq("k"), "ts_ms", 2000L, 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((0L, "a")) == 3L)      // [0,2000) holds 100, 900, 1100
    assert(got((1000L, "a")) == 1L)   // [1000,3000) holds only 1100
    assert(got((-1000L, "a")) == 2L)  // [-1000,1000) holds 100, 900
    assert(got((0L, "b")) == 1L)
  }

  test("cumulativeCount: running totals reset per span") {
    val df = Seq(("a", 0L), ("a", 500L), ("a", 1500L), ("a", 10500L))
      .toDF("k", "ts_ms")
    // span 10000, step 1000
    val got = Windows.cumulativeCount(df, Seq("k"), "ts_ms", 10000L, 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got((0L, 0L)) == 2L)     // 0 + 500
    assert(got((0L, 1000L)) == 3L)  // + 1500
    assert(got((10000L, 10000L)) == 1L) // new span restarts
  }

  test("lastTimeAndCount") {
    val df = Seq(("a", 5L), ("a", 9L), ("b", 1L)).toDF("k", "ts_ms")
    val got = Windows.lastTimeAndCount(df, Seq("k"), "ts_ms")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (9L, 2L), "b" -> (1L, 1L)))
  }

  test("decayedScore: half-life semantics, future events excluded, partition-invariant") {
    val hl = 1000L
    val asOf = 10000L
    val rows = Seq(
      ("u", asOf),           // age 0 -> 1e6
      ("u", asOf - hl),      // one half-life -> 500000
      ("u", asOf - 2 * hl),  // two -> 250000
      ("u", asOf + 1),       // future -> excluded
      ("v", asOf - hl))
    def run(parts: Int) = Windows
      .decayedScore(rows.toDF("k", "ts").repartition(parts), Seq("k"), "ts",
        hl, asOf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = run(1)
    assert(got("u") == ((3L, 1750000L)))
    assert(got("v") == ((1L, 500000L)))
    assert(run(7) == got)
  }

  test("slidingPercentiles matches brute rank selection per window") {
    val sliceMs = 1000L
    val rows = (0 until 300).map(i =>
      (((i * 7919) % 50).toLong, (i % 5).toLong * sliceMs + i % 997))
    val df = rows.toDF("v", "ts").repartition(7)
    val got = Windows.slidingPercentiles(df, col("v"), col("ts"),
        sliceMs, slicesPerWindow = 3, percents = Seq(50, 99))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = (for {
      w <- (-2 to 4).map(_ * sliceMs)
      inWin = rows.filter { case (_, t) =>
        val s = t - t % sliceMs; s >= w && s < w + 3 * sliceMs }
      if inWin.nonEmpty
      sorted = inWin.map(_._1).sorted
      p <- Seq(50L, 99L)
    } yield (w, p) -> sorted(((sorted.size * p + 99) / 100).toInt - 1)).toMap
    assert(got == brute)
  }

  test("trendingTopK ranks by delta vs previous window, new keys count fully") {
    val sliceMs = 1000L
    // window [0,3): hot=4, steady=2; window [1000,4000): hot=1 (falls),
    // steady=2 (flat), fresh=3 (new) — riser order: fresh(+3) > steady(0) > hot(-3)
    def ev(key: String, slice: Long, n: Int) =
      Seq.fill(n)((key, slice * sliceMs + 7))
    val rows = ev("hot", 0, 4) ++ ev("steady", 0, 1) ++ ev("steady", 1, 1) ++
      ev("hot", 3, 1) ++ ev("steady", 3, 1) ++ ev("fresh", 3, 3)
    val got = Windows.trendingTopK(rows.toDF("k", "ts").repartition(5),
        col("k"), col("ts"), sliceMs, slicesPerWindow = 3, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(4)) ->
        (r.getString(1), r.getLong(3))).toMap
    // window starting at 1000 covers slices 1-3... slices are 1,2,3 →
    // counts: steady 2 (slices 1,3), hot 1 (slice 3), fresh 3 (slice 3);
    // previous window (0) covers slices 0-2: hot 4, steady 2.
    assert(got((1000L, 1L)) == (("fresh", 3L)))
    assert(got((1000L, 2L)) == (("steady", 0L)))
    // window at 0 covers slices 0-2 (hot 4, steady 2); its previous
    // window (-1000, slices -1..1) holds the same counts → both deltas 0,
    // tie breaks on key asc
    assert(got((0L, 1L)) == (("hot", 0L)))
    assert(got((0L, 2L)) == (("steady", 0L)))
    // leading partial window (-2000, slice 0 only): no previous data →
    // deltas equal raw counts
    assert(got((-2000L, 1L)) == (("hot", 4L)))
  }
}
