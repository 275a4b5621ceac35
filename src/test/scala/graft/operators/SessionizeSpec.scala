package graft.operators

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap splits sessions; bounds and counts are per key") {
    val df = Seq(
      ("u1", 0L, 1L), ("u1", 50L, 2L), ("u1", 200L, 3L), // gap 100 → [0,50], [200]
      ("u2", 10L, 4L)
    ).toDF("key", "ts_ms", "id")
    val got = Sessionize.sessionBounds(df, Seq("key"), "ts_ms", 100L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("u1", 0L, 50L, 2L), ("u1", 200L, 200L, 1L), ("u2", 10L, 10L, 1L)))
  }

  test("boundary: exactly-gap spacing stays in one session") {
    val df = Seq(("u", 0L, 1L), ("u", 100L, 2L)).toDF("key", "ts_ms", "id")
    val got = Sessionize.sessionBounds(df, Seq("key"), "ts_ms", 100L, "id").collect()
    assert(got.length == 1 && got.head.getLong(3) == 2L)
  }
}
