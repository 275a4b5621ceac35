package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def ratings(rows: Seq[(Long, Long)], iters: Int = 3) =
    Preference.bradleyTerryE6(rows.toDF("w", "l"), col("w"), col("l"), iters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("transitive dominance orders ratings; stats are exact") {
    // A(1) beats B(2) twice, B beats C(3) twice, A beats C twice
    val got = ratings(Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L),
      (1L, 3L), (1L, 3L)))
    assert(got.keySet == Set(1L, 2L, 3L))
    val (rA, rB, rC) = (got(1L)._1, got(2L)._1, got(3L)._1)
    assert(rA > rB && rB > rC, s"A=$rA B=$rB C=$rC")
    assert(rA == 1000000L) // max-renorm pins the leader at 1e6
    assert(got(1L)._2 == 4L && got(2L)._2 == 2L && got(3L)._2 == 0L) // wins
    assert(got(1L)._3 == 4L && got(2L)._3 == 4L && got(3L)._3 == 4L) // comps
    assert(rC >= 1L) // zero-win items clamp, never divide-by-zero later
  }

  test("an even 50/50 pair lands both items at the same rating") {
    val got = ratings(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 1L)))
    assert(got(1L)._1 == got(2L)._1)
    assert(got(1L)._1 == 1000000L)
  }

  test("ratings are invariant to partitioning and input order") {
    val rows = (0 until 500).map { i =>
      val a = (i * 7919L) % 13; val b = (i * 104729L) % 13
      if (a == b) ((a + 1) % 13, b) else if (i % 3 == 0) (b, a) else (a, b)
    }
    val one = Preference.bradleyTerryE6(
      rows.toDF("w", "l").repartition(1), col("w"), col("l"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Preference.bradleyTerryE6(
      rows.reverse.toDF("w", "l").repartition(17), col("w"), col("l"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("groupAdvantageE6: hand-computed two-row group is exact") {
    // group g: rewards {0, 200}: n=2, s=200, ss=40000, vn=40000,
    // isqrt=200 → adv(0) = (0·2−200)·1e6/200 = −1e6; adv(200) = +1e6.
    val df = Seq(("g", 1L, 0L), ("g", 2L, 200L), ("solo", 3L, 77L))
      .toDF("grp", "id", "r")
    val got = Preference.groupAdvantageE6(df, Seq("grp"), col("r"))
      .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    assert(got(1L) == -1000000L && got(2L) == 1000000L)
    assert(got(3L) == 0L) // degenerate single-row group
  }

  test("groupAdvantageE6: zero-variance group emits 0; sums center") {
    val rows = Seq.tabulate(60)(i => ("a", i.toLong, (i % 7) * 100L)) ++
      Seq.tabulate(5)(i => ("flat", 100L + i, 500L))
    val out = Preference.groupAdvantageE6(
        rows.toDF("grp", "id", "r"), Seq("grp"), col("r"))
      .collect().map(x => (x.getString(0), x.getLong(3)))
    assert(out.filter(_._1 == "flat").forall(_._2 == 0L))
    // truncation keeps the group sum near zero: |Σ adv| < n · 1 unit
    val sumA = out.filter(_._1 == "a").map(_._2).sum
    assert(math.abs(sumA) < 60L, s"sumA=$sumA")
  }

  test("groupAdvantageE6 is invariant to partitioning") {
    val rows = (0 until 400).map(i =>
      ((i % 23).toString, i.toLong, (i * 7919L) % 1000))
    val a = Preference.groupAdvantageE6(
        rows.toDF("grp", "id", "r").repartition(1), Seq("grp"), col("r"))
      .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    val b = Preference.groupAdvantageE6(
        rows.reverse.toDF("grp", "id", "r").repartition(13),
        Seq("grp"), col("r"))
      .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    assert(a == b)
  }

  test("self-comparisons and nulls are dropped") {
    val df = Seq((Some(1L), Some(1L)), (Some(1L), Some(2L)),
      (None, Some(2L)), (Some(2L), None)).toDF("w", "l")
    val got = Preference.bradleyTerryE6(df, col("w"), col("l"), 2)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // only the one real comparison's items
  }
}
