package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalCurvesSpec extends SparkSpec {
  import spark.implicits._

  private def passCurve(rows: Seq[(String, Boolean)], ks: Seq[Int],
      maxN: Int = 1000) =
    EvalCurves.passAtKCurve(rows.toDF("p", "c"), col("p"), col("c"),
        ks, maxN)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3)))
      .toMap

  test("passAtK: hand-computed two-problem curve is exact") {
    // A: n=3 c=1 → pass@1 = 1−2/3, pass@2 = 1−1/3, pass@3 = 1 (fails<k)
    // B: n=2 c=0 → pass@1 = 0, pass@2 = 0, excluded at k=3 (n<k)
    val rows = Seq(("A", true), ("A", false), ("A", false),
      ("B", false), ("B", false))
    val got = passCurve(rows, Seq(1, 2, 3))
    assert(got(1) == (2L, (333334L + 0L) / 2))          // mean 166667
    assert(got(2) == (2L, (666667L + 0L) / 2))          // mean 333333
    assert(got(3) == (1L, 1000000L))                    // only A has n≥3
  }

  test("passAtK: all-correct problem saturates at 1e6 for every k ≤ n") {
    val got = passCurve(Seq.fill(4)(("A", true)), Seq(1, 2, 4))
    assert(got.values.forall(_ == (1L, 1000000L)))
  }

  test("passAtK: over-maxN problem fails loudly, not wrongly") {
    val rows = (0 until 5).map(i => ("A", i % 2 == 0))
    val e = intercept[Exception] {
      passCurve(rows, Seq(1), maxN = 4)
    }
    assert(e.getMessage != null)
  }

  private def bestCurve(rows: Seq[(String, Long, Int)], ns: Seq[Int]) =
    EvalCurves.bestOfNCurve(rows.toDF("p", "r", "t"), col("p"),
        col("r"), col("t"), ns)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3)))
      .toMap

  test("bestOfN: hand-computed three-sample curve is exact") {
    // rewards {10,20,30}: E[bo1]=20, E[bo2]=(20+2·30)/3=80/3, E[bo3]=30
    val rows = Seq(("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3))
    val got = bestCurve(rows, Seq(1, 2, 3))
    assert(got(1) == (1L, 20000000L))
    assert(got(2) == (1L, 26666666L))  // floor(80/3 · 1e6)
    assert(got(3) == (1L, 30000000L))
  }

  test("bestOfN: value is invariant to tie order among equal rewards") {
    val a = bestCurve(Seq(("A", 5L, 1), ("A", 5L, 2), ("A", 9L, 3)), Seq(2))
    val b = bestCurve(Seq(("A", 5L, 2), ("A", 5L, 1), ("A", 9L, 3)), Seq(2))
    assert(a == b)
    // E[bo2] = (5 + 2·9)/3 = 23/3 → 7666666
    assert(a(2) == (1L, 7666666L))
  }

  test("bestOfN: partitioning/order invariance on a seeded corpus") {
    val rows = (0 until 300).map { i =>
      (s"p${i % 7}", (i * 7919L) % 101, i)
    }
    val one = EvalCurves.bestOfNCurve(rows.toDF("p", "r", "t")
        .repartition(1), col("p"), col("r"), col("t"), Seq(1, 3))
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    val many = EvalCurves.bestOfNCurve(rows.reverse.toDF("p", "r", "t")
        .repartition(13), col("p"), col("r"), col("t"), Seq(1, 3))
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    assert(one == many)
  }

  test("wilson: textbook bounds — 10/10, 0/10, 1/1 vs 90/100") {
    val rows =
      (1 to 10).map(i => ("ten", true)) ++
      (1 to 10).map(i => ("zero", false)) ++
      Seq(("one", true)) ++
      ((1 to 90).map(_ => ("ninety", true)) ++
        (1 to 10).map(_ => ("ninety", false)))
    val got = EvalCurves.wilsonLowerBoundE6(rows.toDF("it", "s"),
        col("it"), col("s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("ten") == 722459L)    // Wilson lb(10/10, z=1.96) ≈ 0.72246
    assert(got("zero") == 0L)
    assert(got("one") == 206543L)    // ≈ 0.20654
    assert(got("ninety") == 825632L) // ≈ 0.82563
    // the point of the lower bound: 1/1 must NOT outrank 90/100
    assert(got("one") < got("ninety"))
  }

  test("youdenTableE6: hand ROC census; J ties break to the lower " +
      "threshold") {
    import spark.implicits._
    // score 2: 4 pos / 1 neg; score 1: 1 pos / 4 neg → J best at t=2
    val df = (Seq.fill(4)((2L, true)) ++ Seq((2L, false)) ++
      Seq((1L, true)) ++ Seq.fill(4)((1L, false))).toDF("s", "p")
    val got = EvalCurves.youdenTableE6(df, col("s"), col("p"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(got(2L) == ((800000L, 200000L, 600000L, true)))
    assert(got(1L) == ((1000000L, 1000000L, 0L, false)))

    // uniform: every threshold has J = 0 → best is the LOWEST t
    val flat = (Seq((2L, true), (2L, false), (1L, true), (1L, false)))
      .toDF("s", "p")
    val f = EvalCurves.youdenTableE6(flat, col("s"), col("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(f(1L) && !f(2L))
  }
}
