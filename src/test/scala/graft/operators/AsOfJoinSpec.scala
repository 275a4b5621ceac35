package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // fact: (id, key, ts) — dim: (key, did, dts)
  private lazy val fact = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
    .toDF("id", "key", "ts_ms")
  private lazy val dim = Seq(("u1", 10L, 90L), ("u1", 11L, 100L), ("u1", 12L, 240L),
    ("u2", 20L, 60L)).toDF("key", "did", "dts_ms")

  private def run(tolerance: Long = Long.MaxValue) =
    AsOfJoin.leftAsOf(fact, dim, Seq("key"), "ts_ms", "dts_ms",
      Seq("did"), "did", tolerance)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("latest dim at-or-before fact ts wins; same-ms dim is visible") {
    val m = run()
    assert(m(1L) == Some(11L)) // dts=100 == fact ts → included, beats dts=90
    assert(m(2L) == Some(12L)) // 240 < 250
  }

  test("no preceding dim -> null") {
    val m = run()
    assert(m(3L) == None) // u2's only dim is at 60 > 50
  }

  test("tolerance gates matches") {
    val m = run(tolerance = 5L)
    assert(m(1L) == Some(11L)) // 100-100=0 <= 5
    assert(m(2L) == None)      // 250-240=10 > 5
  }
}
