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

  test("directionalAsOf: backward/forward/nearest with equal-ts inclusivity") {
    import org.apache.spark.sql.functions.col
    val fact = Seq(("u", 1L, 100L), ("u", 2L, 200L), ("u", 3L, 350L))
      .toDF("k", "fid", "fts")
    // dims at 100 (equal-ts), 210, 300; duplicate dim at ts 100 -> max ord
    val dim = Seq(("u", 10L, 100L), ("u", 11L, 100L), ("u", 20L, 210L),
      ("u", 30L, 300L)).toDF("k", "did", "dts")
    def run(direction: String, tol: Long = Long.MaxValue) =
      AsOfJoin.directionalAsOf(fact, dim, Seq("k"), "fts", "dts",
        Seq("did"), "did", direction, tol)
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // backward: fact@100 sees the equal-ts dim (max ord 11); fact@200
    // sees 100's dim; fact@350 sees 300's
    assert(run("backward") == Map(1L -> Some(11L), 2L -> Some(11L),
      3L -> Some(30L)))
    // forward: fact@100 sees equal-ts 11; fact@200 -> 210; fact@350 -> none
    assert(run("forward") == Map(1L -> Some(11L), 2L -> Some(20L),
      3L -> None))
    // nearest: fact@200 is 100 away from prev, 10 from next -> next;
    // fact@350 only prev; equal distances tie to backward
    assert(run("nearest") == Map(1L -> Some(11L), 2L -> Some(20L),
      3L -> Some(30L)))
    // nearest tie: fact at 255 is 45 from 210 and 45 from 300 -> backward
    val tied = AsOfJoin.directionalAsOf(
        Seq(("u", 9L, 255L)).toDF("k", "fid", "fts"), dim, Seq("k"),
        "fts", "dts", Seq("did"), "did", "nearest")
      .collect().head
    assert(tied.getLong(3) == 20L)
    // tolerance gates both directions
    assert(run("nearest", tol = 5L) ==
      Map(1L -> Some(11L), 2L -> None, 3L -> None))
  }
}
