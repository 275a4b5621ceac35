package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook life table with censoring") {
    // durations: events at t=2 (×2), t=5; censored at t=3, t=5.
    val df = Seq((2L, true), (2L, true), (3L, false), (5L, true),
      (5L, false)).toDF("t", "obs")
    val got = Survival.kaplanMeier(df, col("t"), col("obs"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // t=2: risk 5, d=2, hazard 400000. t=5: risk 2 (the t=3 censor left),
    // d=1, hazard 500000. t=3 has no events → no row.
    assert(got == Map(2L -> ((5L, 2L, 400000L)),
      5L -> ((2L, 1L, 500000L))))
  }

  test("all-censored input yields an empty table") {
    val df = Seq((1L, false), (4L, false)).toDF("t", "obs")
    assert(Survival.kaplanMeier(df, col("t"), col("obs")).count() == 0L)
  }

  test("ties between events and censors at the same t share the risk set") {
    val df = Seq((3L, true), (3L, false), (3L, true)).toDF("t", "obs")
    val r = Survival.kaplanMeier(df, col("t"), col("obs")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 2L, 666666L)))
  }

  test("logRank is exact when d·n1·1e9 exceeds Long.MaxValue") {
    // One event time: 150k group-1 subjects (100k observed) vs 50k
    // group-2 (10k observed). d·n1 = 110000·150000 = 1.65e10, so the
    // pre-guard pure-LONG `d * n1 * 1000000000` wrapped (1.65e19 >
    // 2^63−1). Exact expectation: e1_e9 = 1.65e19 / 200000 = 8.25e13.
    val df = spark.range(200000L).selectExpr(
      "1L AS t",
      "CASE WHEN id < 150000 THEN id < 100000 ELSE id < 160000 END AS obs",
      "id < 150000 AS g1")
    val r = Survival.logRank(df, col("t"), col("obs"), col("g1"))
      .collect().head
    assert(r.getAs[Long]("o1") == 100000L)
    assert(r.getAs[Long]("e1_e9") == 82500000000000L)
    assert(r.getAs[Long]("chi2_e6") > 0L)
  }

  test("nelsonAalen accumulates d/n increments past censored times") {
    // t=1: 1 event of 4 at risk → inc 250000000, H = 250000000
    // t=2: censored only — no row, but it shrinks the risk set
    // t=3: 1 event of 2 at risk → inc 500000000, H = 750000000
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, false))
      .toDF("t", "obs")
    val got = Survival.nelsonAalen(df, col("t"), col("obs"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      1L -> ((4L, 1L, 250000000L, 250000000L)),
      3L -> ((2L, 1L, 500000000L, 750000000L))))
  }

  test("competingRisks: hand-computed AJ fold, coherence, and the " +
      "census guard") {
    import spark.implicits._
    // subjects: (t=1, cause1), (t=2, cause2), (t=2, censored),
    // (t=3, cause1)
    val subj = Seq((1L, 1), (2L, 2), (2L, 0), (3L, 1)).toDF("t", "k")
    val rows = Survival.competingRisks(subj, col("t"), col("k"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // t=1: n=4, S(−)=1e6, inc1=250000 → S→750000
    assert(rows(1L) == ((4L, 1L, 0L, 1000000L, 250000L, 0L)))
    // t=2: n=3, S(−)=750000, inc2=250000 → S→500000 (censor leaves too)
    assert(rows(2L) == ((3L, 0L, 1L, 750000L, 250000L, 250000L)))
    // t=3: n=1, S(−)=500000, inc1=500000 → CIF1=750000
    assert(rows(3L) == ((1L, 1L, 0L, 500000L, 750000L, 250000L)))
    // coherence: CIF1 + CIF2 + S(final) = 750000 + 250000 + 0 = 1e6
    // (exact here; ≤ |census| ulps of truncation in general)

    val err = intercept[IllegalArgumentException] {
      Survival.competingRisks(subj, col("t"), col("k"),
        maxCensusRows = 2)
    }
    assert(err.getMessage.contains("time census exceeds"))
  }

  test("coxScoreTest: hand risk-set covariate moments") {
    import spark.implicits._
    // A(t1, event, x=2), B(t1, cens, x=0), C(t2, event, x=1)
    val subj = Seq((1L, true, 2L), (1L, false, 0L), (2L, true, 1L))
      .toDF("t", "obs", "x")
    val r = Survival.coxScoreTest(subj, col("t"), col("obs"),
      col("x")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    // t1: u = 2e9 − 3·1e9/3 = 1e9, v = 6·2·1e12/18; t2: u = 0, v = 0
    assert(r.getLong(2) == 1000000000L)
    assert(BigInt(r.getDecimal(3).toBigInteger) ==
      BigInt("666666666666"))
    assert(r.getLong(4) == (BigInt("1000000000000000000") /
      BigInt("666666666666")).toLong)
  }

  test("gehanWilcoxon: n-weighted log-rank matches the BigInt mirror") {
    import spark.implicits._
    // g1: (1, event), (2, cens); g2: (1, event), (2, event)
    val subj = Seq((1L, true, true), (2L, false, true),
      (1L, true, false), (2L, true, false)).toDF("t", "obs", "g1")
    val r = Survival.gehanWilcoxon(subj, col("t"), col("obs"),
      col("g1")).collect().head
    assert(BigInt(r.getDecimal(0).toBigInteger) == 4)   // o_w
    assert(BigInt(r.getDecimal(1).toBigInteger) ==
      BigInt("5000000000"))                              // e_w_e9
    val vw = BigInt(16) * 333333333333L + BigInt(4) * 250000000000L
    assert(BigInt(r.getDecimal(2).toBigInteger) == vw)
    val diff = BigInt(4) * 1000000000 - BigInt("5000000000")
    assert(r.getLong(3) == (diff * diff / vw).toLong)
  }

  test("restrictedMeanSurvival: hand KM area with the horizon cut") {
    import spark.implicits._
    val subj = Seq((1L, true), (2L, false), (3L, true)).toDF("t", "o")
    val r = Survival.restrictedMeanSurvival(subj, col("t"), col("o"),
      tau = 2L).collect().head
    // S drops to 2/3 at t=1; area = 1e6·1 + 666666·1 = 1_666_666
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 1L)))
    assert(r.getLong(3) == 666666L)
    assert(r.getLong(4) == 1666666L)

    // curve outliving τ: no events → RMST = τ·1e6 exactly
    val cens = Seq((5L, false), (6L, false)).toDF("t", "o")
    val c = Survival.restrictedMeanSurvival(cens, col("t"), col("o"),
      tau = 3L).collect().head
    assert(c.getLong(3) == 1000000L && c.getLong(4) == 3000000L)
  }
}
