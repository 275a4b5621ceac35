package graft.agg

import graft.SparkSpec

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
}
