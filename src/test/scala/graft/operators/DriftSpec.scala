package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiTotal(bins: org.apache.spark.sql.DataFrame): Double =
    bins.agg(sum(col("psi_term_e6"))).head().getLong(0) / 1e6

  test("stationary target scores near zero; shifted target alarms") {
    val ref = (0L until 2000L).map(i => (i, i % 100)).toDF("k", "v")
    // same distribution, different rows → ≈ 0
    val same = (5000L until 7000L).map(i => (i, i % 100)).toDF("k", "v")
    val calm = Drift.psiBins(ref, same, col("v"), col("k"), buckets = 10)
    assert(math.abs(psiTotal(calm)) < 0.01, "stationary must be ~0")
    // mass shifted up by 50 → strong drift, and the per-bin terms must
    // localize it: depleted low bins positive via the ln ratio
    val shifted = (0L until 2000L).map(i => (i, i % 100 + 50)).toDF("k", "v")
    val drift = Drift.psiBins(ref, shifted, col("v"), col("k"), buckets = 10)
    assert(psiTotal(drift) > 0.25, s"shift must alarm, got ${psiTotal(drift)}")
    // bin census stays exact
    val rows = drift.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._2).sum == 2000L && rows.map(_._3).sum == 2000L)
  }

  test("ksStatistic: exact D on a hand case, shift alarms, identity is zero") {
    // ref {1,2,3,4}, tgt {3,4,5,6}: D = 1/2 at v=2 → d_num = 2/4·16 = 8
    val ref = Seq(1L, 2L, 3L, 4L).toDF("v")
    val tgt = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksStatistic(ref, tgt, col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 8L, 2L)))
    // identical samples → D = 0, witness = smallest value
    val same = Drift.ksStatistic(ref, ref, col("v")).collect().head
    assert(same.getLong(2) == 0L && same.getLong(3) == 1L)
    // strong shift on larger samples → D near n1·n2
    val a = (0L until 500L).map(_ % 50).toDF("v")
    val b = (0L until 400L).map(i => i % 50 + 100).toDF("v")
    val big = Drift.ksStatistic(a, b, col("v")).collect().head
    assert(big.getLong(2) == 500L * 400L, "disjoint supports → D = 1")
  }

  test("bins and terms are partition-invariant") {
    val ref = (0L until 999L).map(i => (i, (i * 7) % 83)).toDF("k", "v")
    val tgt = (0L until 777L).map(i => (i, (i * 11) % 90)).toDF("k", "v")
    def run(parts: Int) =
      Drift.psiBins(ref.repartition(parts), tgt.repartition(parts),
        col("v"), col("k"), buckets = 4).orderBy("bucket").collect().toSeq
    assert(run(1) == run(13))
  }

  test("changePoint finds the known shift day with the exact KS numerator") {
    import org.apache.spark.sql.functions.col
    // days 0-3 emit value 10 (5 rows each), days 4-7 emit value 20:
    // the clean break at t=4 separates perfectly -> D = 1, d_num = n1*n2
    val rows = (for (d <- 0L until 8L; i <- 0 until 5)
      yield (d, if (d < 4) 10L else 20L)).toDF("day", "v")
    val r = Drift.changePoint(rows, col("day"), col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 20L, 20L, 400L, 10L)))
  }

  test("changePoint agrees with per-split ksStatistic brute force") {
    import org.apache.spark.sql.functions.col
    val data = (0L until 120L).map { i =>
      val day = i % 6
      val v = if (day >= 3) (i * 13 % 7) + 3 else i * 11 % 7
      (day, v)
    }
    val df = data.toDF("day", "v")
    val got = Drift.changePoint(df, col("day"), col("v")).collect().head
    val brute = (1L until 6L).map { t =>
      val r = Drift.ksStatistic(
        df.where(col("day") < t), df.where(col("day") >= t),
        col("v")).collect().head
      (r.getLong(2), t)   // (d_num, t)
    }.maxBy { case (d, t) => (d, -t) }
    assert((got.getLong(3), got.getLong(0)) == brute)
  }
  test("jsDivergenceE6: hand two-group case under the pinned micro-nat chains") {
    // X = {a,a,b}, Y = {b,b,b}; corpus = {a:2, b:4}.
    // Pinned e6 terms give jsd_X = 56634, jsd_Y = 132305 (entropy form,
    // per-term rounding then truncating halving — see scaladoc).
    val rows = Seq(("X", "a"), ("X", "a"), ("X", "b"),
      ("Y", "b"), ("Y", "b"), ("Y", "b"))
    val got = Drift.jsDivergenceE6(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("X") == ((2L, 3L, 56634L)), s"got $got")
    assert(got("Y") == ((1L, 3L, 132305L)), s"got $got")
  }

  test("jsDivergenceE6: a group identical to the corpus reads 0") {
    // one group = the whole corpus → P = Q → JSD exactly 0 (the clamp
    // absorbs ±1 micro-nat term rounding)
    val rows = Seq(("X", "a"), ("X", "a"), ("X", "b"))
    val got = Drift.jsDivergenceE6(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().head
    assert(got.getLong(3) == 0L)
  }

  test("mannKendall: hand S/var18, tie collapse, boundary significance") {
    val rows =
      (1 to 5).map(d => ("up", d.toLong, d.toLong)) ++          // S=10
      (1 to 5).map(d => ("flat", d.toLong, 7L)) ++              // S=0, ties
      (1 to 5).map(d => ("down", d.toLong, (10 - d).toLong)) ++ // S=-10
      (1 to 4).map(d => ("short", d.toLong, d.toLong))          // S=6, n=4
    val got = Drift.mannKendall(rows.toDF("s", "t", "x").repartition(4),
        "s", "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // n=5 no ties: var18 = 5·4·15 = 300; (10−1)²·18e12 > 1.96²e12·300
    assert(got("up") == ((5L, 10L, 300L, "increasing")))
    assert(got("down") == ((5L, -10L, 300L, "decreasing")))
    // all tied: S=0, tie18 = 5·4·15 → var18 = 0, never significant
    assert(got("flat") == ((5L, 0L, 0L, "none")))
    // n=4 strictly increasing is NOT significant at 1.96:
    // (6−1)²·18e12 = 4.5e14 < 3.8416e12·156 ≈ 5.99e14
    assert(got("short") == ((4L, 6L, 156L, "none")))
  }

}
