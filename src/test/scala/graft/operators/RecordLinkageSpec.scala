package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // two entities in one block; b's copy of id 2 has a corrupted name
  private val a = Seq((1L, 10, "ann", "x"), (2L, 10, "bob", "y"))
    .toDF("rid", "blk", "k_name", "k_tag")
  private val b = Seq((1L, 10, "ann", "x"), (2L, 10, "bobX", "y"))
    .toDF("rid", "blk", "k_name", "k_tag")

  private def scores() =
    RecordLinkage.fellegiSunterScores(a, b, "rid", Seq("blk"),
        Seq(("k_name", 900000L), ("k_tag", 800000L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("true pairs outscore cross pairs; agreement counts are exact") {
    val got = scores()
    assert(got.size == 4) // one block, 2×2 pairs
    // (1,1): both fields agree; (2,2): name corrupted, tag agrees
    assert(got((1L, 1L))._2 == 2L)
    assert(got((2L, 2L))._2 == 1L)
    // cross pairs agree on nothing
    assert(got((1L, 2L))._2 == 0L && got((2L, 1L))._2 == 0L)
    assert(got((1L, 1L))._1 > got((2L, 2L))._1)
    assert(got((2L, 2L))._1 > got((1L, 2L))._1)
  }

  test("weights replay the pinned formula on the exact ppm u") {
    // u(k_name): frequencies 1,1,1 over n=2? no — b has 3 distinct
    // values? b: ann, bobX → counts {ann:1, bobX:1}, n=2 →
    // u = (1+1)·1e6 div 4 = 500000. u(k_tag): {x:1, y:1} → 500000.
    val got = scores()
    def w(m: Long, u: Long): Long =
      math.round(math.log(m.toDouble / u.toDouble) * 1e6)
    def wd(m: Long, u: Long): Long =
      math.round(math.log((1000000.0 - m) / (1000000.0 - u)) * 1e6)
    assert(got((1L, 1L))._1 == w(900000L, 500000L) + w(800000L, 500000L))
    assert(got((2L, 2L))._1 == wd(900000L, 500000L) + w(800000L, 500000L))
  }

  test("pairs never leave their block") {
    val a2 = Seq((1L, 1, "n", "t"), (2L, 2, "n", "t"))
      .toDF("rid", "blk", "k_name", "k_tag")
    val got = RecordLinkage.fellegiSunterScores(a2, a2, "rid", Seq("blk"),
      Seq(("k_name", 900000L), ("k_tag", 800000L))).collect()
    assert(got.length == 2) // only the two same-block self pairs
    assert(got.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("NULL keys never agree") {
    val an = Seq((1L, 1, Option.empty[String], "t"))
      .toDF("rid", "blk", "k_name", "k_tag")
    val got = RecordLinkage.fellegiSunterScores(an, an, "rid", Seq("blk"),
      Seq(("k_name", 900000L), ("k_tag", 800000L))).collect().head
    assert(got.getLong(3) == 1L) // only k_tag agrees
  }

  test("hard-EM m estimation: two rounds replay by hand") {
    // one block, records (1,x,p),(2,y,p): patterns (1,1)x2 self pairs,
    // (0,1)x2 cross pairs. u(k_name)=500000, u(k_tag)=1e6->999999.
    val d = Seq((1L, 1, "x", "p"), (2L, 1, "y", "p"))
      .toDF("rid", "blk", "k_name", "k_tag")
    val got = RecordLinkage.fellegiSunterEmM(d, d, "rid", Seq("blk"),
        Seq(("k_name", 800000L), ("k_tag", 800000L)),
        thresholdE6 = 0L, rounds = 2)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))))
      .toMap
    def wa(m: Long, u: Long): Long =
      math.round(math.log(m.toDouble / u.toDouble) * 1e6)
    def wd(m: Long, u: Long): Long =
      math.round(math.log((1000000.0 - m) / (1000000.0 - u)) * 1e6)
    // round 1: only the self-pair pattern scores >= 0 under m=0.8 →
    // linked mass 2, both m update to (2+1)*1e6 div (2+2) = 750000;
    // round 2 re-links the same pattern → m stays 750000
    assert(got("k_name") == ((750000L, 500000L,
      wa(750000L, 500000L), wd(750000L, 500000L), 2L)))
    assert(got("k_tag") == ((750000L, 999999L,
      wa(750000L, 999999L), wd(750000L, 999999L), 2L)))
  }

  test("hard-EM: empty linked set falls back to the Laplace prior") {
    // disjoint blocks -> no pairs at all -> nl=0, m = 1e6/2 = 500000
    val a2 = Seq((1L, 1, "x", "p")).toDF("rid", "blk", "k_name", "k_tag")
    val b2 = Seq((2L, 2, "y", "q")).toDF("rid", "blk", "k_name", "k_tag")
    val got = RecordLinkage.fellegiSunterEmM(a2, b2, "rid", Seq("blk"),
        Seq(("k_name", 800000L), ("k_tag", 800000L)), 0L, 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(5)))
      .toMap
    assert(got("k_name") == (500000L, 0L))
    assert(got("k_tag") == (500000L, 0L))
  }
}
