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

  test("groupAdvantageE6 isqrt correction is exact at the LONG-domain edge") {
    // n=2, rewards a=1518500250, b=−1518500249: n·Σr² ≈ 9.2e18 (fits
    // LONG, within contract), vn = (a−b)² = 3037000499² — the largest
    // perfect square below Long.Max. The pre-fix LONG correction wrapped
    // (s0+1)² negative and picked sd = 3037000500 → adv 999999; the
    // DECIMAL(38,0) squares keep sd = 3037000499 → adv exactly ±1e6.
    val a = 1518500250L; val b = -1518500249L
    val df = Seq(("g", 1L, a), ("g", 2L, b)).toDF("grp", "id", "r")
    val got = Preference.groupAdvantageE6(df, Seq("grp"), col("r"))
      .collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    assert(got(1L) == 1000000L && got(2L) == -1000000L, s"got=$got")
  }

  test("bradleyTerryE6 leaves no cached frames behind (eager + unpersist)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val rows = (1L to 30L).map(i => (i % 5 + 1, i % 7 + 1))
      .filter(p => p._1 != p._2)
    val out = Preference.bradleyTerryE6(rows.toDF("w", "l"),
      col("w"), col("l"), 3)
    assert(out.count() > 0)
    // The only NEW persisted RDDs allowed are localCheckpoint artifacts
    // (isCheckpointed); the und/items MEMORY_AND_DISK persists must be
    // unpersisted by the operator itself, no caller clearCache needed.
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) => !before(id) && !rdd.isCheckpointed }
    assert(leaked.isEmpty, s"leaked caches: ${leaked.keys}")
  }

  test("krippendorffAlphaNominal matches hand-computed coincidence cases") {
    // Perfect agreement across two categories → α = 1.
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "a"))
    val p = Preference.krippendorffAlphaNominal(
      perfect.toDF("u", "c"), col("u"), col("c")).collect().head
    assert(p.getAs[Long]("alpha_e6") == 1000000L)
    assert(p.getAs[Long]("n") == 6L && p.getAs[Long]("n_units") == 3L)
    // One agreeing pair + one disagreeing pair → α = 0 exactly
    // (Do = 2, De = (n²−Σn_c²)/(n−1) = (16−10)/3 = 2).
    val mixed = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
    val m = Preference.krippendorffAlphaNominal(
      mixed.toDF("u", "c"), col("u"), col("c")).collect().head
    assert(m.getAs[Long]("alpha_e6") == 0L)
    // Single observed category → α undefined (NULL), not a crash.
    val one = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
    val o = Preference.krippendorffAlphaNominal(
      one.toDF("u", "c"), col("u"), col("c")).collect().head
    assert(o.isNullAt(o.fieldIndex("alpha_e6")))
    // Single-rating units drop (unpairable, the standard rule): adding
    // one changes nothing.
    val withSolo = perfect :+ (9L, "b")
    val s = Preference.krippendorffAlphaNominal(
      withSolo.toDF("u", "c"), col("u"), col("c")).collect().head
    assert(s.getAs[Long]("alpha_e6") == 1000000L &&
      s.getAs[Long]("n_units") == 3L)
  }

  test("krippendorffAlphaNominal is partition-invariant and guards maxRaters") {
    val rows = (0 until 300).map(i =>
      ((i % 40).toLong, if ((i * 7919) % 10 < 7) "x" else "y"))
    val a = Preference.krippendorffAlphaNominal(
      rows.toDF("u", "c").repartition(1), col("u"), col("c"))
      .collect().head
    val b = Preference.krippendorffAlphaNominal(
      rows.reverse.toDF("u", "c").repartition(13), col("u"), col("c"))
      .collect().head
    assert(a.getAs[Long]("alpha_e6") == b.getAs[Long]("alpha_e6"))
    assert(a.getAs[java.math.BigDecimal]("alpha_num") ==
      b.getAs[java.math.BigDecimal]("alpha_num"))
    // a 9-rating unit under maxRaters = 3 must raise loudly
    val e = intercept[Exception] {
      Preference.krippendorffAlphaNominal(
        (1 to 9).map(i => (1L, s"c${i % 2}")).toDF("u", "c"),
        col("u"), col("c"), maxRaters = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).mkString.contains("raise maxRaters"))
  }

  test("pairMarginHistogramE6: hand-computed buckets, floor on negatives") {
    val ratings = Seq((1L, 1000000L), (2L, 500000L), (3L, 949999L))
      .toDF("item", "rating_e6")
    // margins: 1>2 three times (+500000 → bucket 5), 2>1 once
    // (−500000 → floor bucket −5), 1>3 once (+50001 → bucket 0),
    // 3>1 once (−50001 → bucket −1: floor, not truncation)
    val pairs = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L),
      (3L, 1L)).toDF("w", "l")
    val got = Preference.pairMarginHistogramE6(pairs, col("w"), col("l"),
        ratings)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      5L -> (3L, 500000L), -5L -> (1L, 166666L),
      0L -> (1L, 166666L), -1L -> (1L, 166666L)), s"got=$got")
  }

  test("krippendorffAlphaInterval matches hand-computed variance cases") {
    // Within-unit agreement despite different unit levels → α = 1.
    val perfect = Seq((1L, 3L), (1L, 3L), (2L, 7L), (2L, 7L))
    val p = Preference.krippendorffAlphaInterval(
      perfect.toDF("u", "x"), col("u"), col("x")).collect().head
    assert(p.getAs[Long]("alpha_e6") == 1000000L)
    // Small within-unit diffs vs large between-unit spread:
    // units (0,1) and (10,11): A = 4S, E = 2(4·222 − 484) = 808,
    // α = (808S − 3·4S)/808S = 796/808 → 985148 truncated e6.
    val near = Seq((1L, 0L), (1L, 1L), (2L, 10L), (2L, 11L))
    val m = Preference.krippendorffAlphaInterval(
      near.toDF("u", "x"), col("u"), col("x")).collect().head
    assert(m.getAs[Long]("alpha_e6") == 985148L)
    // One maximally-disagreeing unit → α = 0 exactly.
    val one = Seq((1L, 0L), (1L, 10L))
    val o = Preference.krippendorffAlphaInterval(
      one.toDF("u", "x"), col("u"), col("x")).collect().head
    assert(o.getAs[Long]("alpha_e6") == 0L)
    // All ratings identical → zero expected disagreement → NULL α.
    val flat = Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L))
    val f = Preference.krippendorffAlphaInterval(
      flat.toDF("u", "x"), col("u"), col("x")).collect().head
    assert(f.isNullAt(f.fieldIndex("alpha_e6")))
    // the maxRaters guard raises loudly
    val e = intercept[Exception] {
      Preference.krippendorffAlphaInterval(
        (1 to 5).map(i => (1L, i.toLong)).toDF("u", "x"),
        col("u"), col("x"), maxRaters = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).mkString.contains("raise maxRaters"))
  }

  test("dawidSkeneOneCoinE6: reliability reweighting overturns a bad majority") {
    // A, B, E are truthful; C, D are adversarial. Item i5 has votes
    // (A=y, C=x, D=x): plain majority says x, but after one accuracy
    // round C and D earn NEGATIVE log-odds weights and the consensus
    // flips to A's y — the point of Dawid–Skene over majority vote.
    val votes = Seq(
      (1L, "A", "x"), (1L, "B", "x"), (1L, "E", "x"), (1L, "C", "y"), (1L, "D", "y"),
      (2L, "A", "x"), (2L, "B", "x"), (2L, "E", "x"), (2L, "C", "y"), (2L, "D", "y"),
      (3L, "A", "y"), (3L, "B", "y"), (3L, "E", "y"), (3L, "C", "x"), (3L, "D", "x"),
      (5L, "A", "y"), (5L, "C", "x"), (5L, "D", "x"))
    val got = Preference.dawidSkeneOneCoinE6(votes.toDF("i", "a", "l"),
        col("i"), col("a"), col("l"), iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got == Map(1L -> ("x", 5L), 2L -> ("x", 5L),
      3L -> ("y", 5L), 5L -> ("y", 3L)), s"got=$got")
    // partition invariance (the long-sum + total-order discipline)
    val shuffled = Preference.dawidSkeneOneCoinE6(
        votes.reverse.toDF("i", "a", "l").repartition(13),
        col("i"), col("a"), col("l"), iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(shuffled == got)
  }

  test("dawidSkeneOneCoinE6: single-label corpus is a fixpoint, not a crash") {
    val votes = Seq((1L, "A", "x"), (1L, "B", "x"), (2L, "A", "x"))
    val got = Preference.dawidSkeneOneCoinE6(votes.toDF("i", "a", "l"),
        col("i"), col("a"), col("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "x", 2L -> "x"))
  }

  test("self-comparisons and nulls are dropped") {
    val df = Seq((Some(1L), Some(1L)), (Some(1L), Some(2L)),
      (None, Some(2L)), (Some(2L), None)).toDF("w", "l")
    val got = Preference.bradleyTerryE6(df, col("w"), col("l"), 2)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // only the one real comparison's items
  }

  private def tiesRatings(rows: Seq[(Long, Long, Int)], iters: Int = 3) =
    Preference.bradleyTerryTiesE6(rows.toDF("a", "b", "o"), col("a"),
        col("b"), col("o"), thetaE6 = 1250000L, iterations = iters)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("btTies: an all-tie corpus lands every item at the same rating") {
    val got = tiesRatings(Seq((1L, 2L, 0), (2L, 3L, 0), (1L, 3L, 0)))
    assert(got.values.map(_._1).toSet.size == 1)
    assert(got(1L)._1 == 1000000L)
    assert(got(1L)._3 == 2L && got(1L)._2 == 0L) // ties=2, wins=0
  }

  test("btTies: dominance survives ties; stats count all three kinds") {
    // A beats B twice, ties B once; B beats C twice
    val got = tiesRatings(Seq((1L, 2L, 1), (1L, 2L, 1), (1L, 2L, 0),
      (2L, 3L, 1), (2L, 3L, 1)))
    val (ra, rb, rc) = (got(1L)._1, got(2L)._1, got(3L)._1)
    assert(ra > rb && rb > rc, s"A=$ra B=$rb C=$rc")
    assert(ra == 1000000L)
    assert(got(1L) == ((ra, 2L, 1L, 3L))) // wins=2 ties=1 comparisons=3
    assert(got(2L) == ((rb, 2L, 1L, 5L)))
    assert(got(3L) == ((rc, 0L, 0L, 2L)))
  }

  test("btTies: invariant to duel orientation and partitioning") {
    val rows = (0 until 400).map { i =>
      val a = (i * 7919L) % 11; val b = (i * 104729L) % 11
      val o = (i % 5) match { case 0 => 0; case 1 | 2 => 1; case _ => -1 }
      if (a == b) ((a + 1) % 11, b, o) else (a, b, o)
    }
    val flipped = rows.map { case (a, b, o) => (b, a, -o) }
    val one = Preference.bradleyTerryTiesE6(rows.toDF("a", "b", "o")
        .repartition(1), col("a"), col("b"), col("o"), 1250000L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Preference.bradleyTerryTiesE6(
        flipped.reverse.toDF("a", "b", "o").repartition(13),
        col("a"), col("b"), col("o"), 1250000L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("pairwiseKappaE6: hand-computed pair is exact") {
    // shared items 1..4: a1 = A,A,B,B; a2 = A,B,B,B → po=3/4,
    // pe_num = 2·1 + 2·3 = 8, κ = (12−8)/(16−8) = 0.5
    val votes = Seq(
      (1L, 10L, "A"), (2L, 10L, "A"), (3L, 10L, "B"), (4L, 10L, "B"),
      (1L, 20L, "A"), (2L, 20L, "B"), (3L, 20L, "B"), (4L, 20L, "B"))
      .toDF("i", "a", "l")
    val r = Preference.pairwiseKappaE6(votes, col("i"), col("a"),
      col("l")).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((10L, 20L)))
    assert(r.getLong(2) == 4L && r.getLong(3) == 3L)
    assert(BigDecimal(r.getDecimal(4)).toLongExact == 8L)
    assert(r.getLong(5) == 500000L)
  }

  test("pairwiseKappaE6: chance-only agreement lands at kappa 0; " +
      "degenerate all-same is NULL") {
    // both annotators always vote A → po = 1, pe = 1 → κ undefined
    val same = Seq((1L, 1L, "A"), (2L, 1L, "A"),
      (1L, 2L, "A"), (2L, 2L, "A")).toDF("i", "a", "l")
    val r = Preference.pairwiseKappaE6(same, col("i"), col("a"),
      col("l")).collect().head
    assert(r.isNullAt(5))
  }

  test("winRatioE6: hand pairwise census — hierarchy falls through " +
      "to the secondary on primary ties") {
    import spark.implicits._
    // treated: (ok,5)×2, (bad,1); control: (ok,3), (bad,9)
    // 6 pairs → wins 4 (2 secondary + 2 primary), losses 2, ties 0
    val df = (Seq.fill(2)((true, false, 5L)) :+ ((true, true, 1L)) :+
      ((false, false, 3L)) :+ ((false, true, 9L)))
      .toDF("tr", "bad", "sec")
    val got = Preference.winRatioE6(df, col("tr"), col("bad"),
      col("sec")).collect().head
    assert((got.getLong(0), got.getLong(1)) == ((3L, 2L)))
    assert(BigInt(got.getDecimal(2).toBigInteger) == 4)
    assert(BigInt(got.getDecimal(3).toBigInteger) == 2)
    assert(BigInt(got.getDecimal(4).toBigInteger) == 0)
    assert(got.getLong(5) == 2000000L)

    // all-win arm: losses 0 → NULL ratio, never infinity
    val aw = Seq((true, false, 9L), (false, true, 1L)).toDF("tr",
      "bad", "sec")
    val g2 = Preference.winRatioE6(aw, col("tr"), col("bad"),
      col("sec")).collect().head
    assert(g2.isNullAt(5))
  }

  test("fleissKappaE6: hand two-rater design; incomplete item " +
      "dropped loudly") {
    import spark.implicits._
    // i1: A,A (agree); i2: A,B (disagree); i3: one rater → dropped
    // P̄ = 1/2, Pe = 10/16 → κ = −1/3
    val df = Seq((1L, 1L, "A"), (1L, 2L, "A"), (2L, 1L, "A"),
      (2L, 2L, "B"), (3L, 1L, "A")).toDF("i", "r", "c")
    val got = Preference.fleissKappaE6(df, col("i"), col("r"),
      col("c"), raters = 2).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((2L, 2L, 1L)))
    assert(got.getLong(3) == 500000L && got.getLong(4) == 625000L)
    assert(got.getLong(5) == -333333L) // toward-zero negative κ
  }

  test("passAtKE6: hand-computed tasks are exact; n<k tasks dropped") {
    // A: n=5,c=2 -> 1-C(3,3)/C(5,3)=0.9; B: n=4,c=0 -> 0;
    // C: n=3,c=3 -> dropped (n<k=... no: k=3, n=3 kept) -> 1e6;
    // D: n=6,c=1 -> 1-C(5,3)/C(6,3)=0.5; E: n=2 -> dropped (n<k)
    val rows =
      (1 to 5).map(i => ("A", i <= 2)) ++
      (1 to 4).map(_ => ("B", false)) ++
      (1 to 3).map(_ => ("C", true)) ++
      (1 to 6).map(i => ("D", i == 1)) ++
      (1 to 2).map(_ => ("E", true))
    val got = Preference.passAtKE6(rows.toDF("task", "ok"),
        col("task"), col("ok"), k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("A", "B", "C", "D"))
    assert(got("A") == ((5L, 2L, 900000L)))
    assert(got("B") == ((4L, 0L, 0L)))
    assert(got("C") == ((3L, 3L, 1000000L)))
    assert(got("D") == ((6L, 1L, 500000L)))
  }

  test("passAtKE6 matches passAtKCurve's mean on a shared frame") {
    // cross-check the two implementations of the same estimator: the
    // curve's sum over problems must equal the task table's sum
    val rows = (0 until 300).map { i =>
      (s"t${i % 17}", (i * 7919) % 5 != 0)
    }
    val perTask = Preference.passAtKE6(rows.toDF("task", "ok"),
      col("task"), col("ok"), k = 4)
    val sumTask = perTask.agg(sum(col("pass_e6"))).head().getLong(0)
    val curve = EvalCurves.passAtKCurve(rows.toDF("task", "ok"),
        col("task"), col("ok"), ks = Seq(4), maxN = 64)
      .collect().head
    assert(BigDecimal(curve.getDecimal(2)) == BigDecimal(sumTask))
  }

  test("eloRatings: hand-stepped 3-match trajectory is exact") {
    // 1 beats 2 twice then loses once: 1516/1484 -> 1530/1470 -> 1512/1488
    val m = Seq((1L, 2L, true, 1L), (1L, 2L, true, 2L), (1L, 2L, false, 3L))
    val got = Preference.eloRatings(m.toDF("a", "b", "aw", "o"),
        col("a"), col("b"), col("aw"), Seq(col("o")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1512L, 3L)))
    assert(got(2L) == ((1488L, 3L)))
  }

  test("eloRatings: zero-sum invariant and order sensitivity") {
    val m = (0 until 200).map { i =>
      ((i * 7L) % 9, (i * 11L + 1) % 9, i % 3 != 0, i.toLong)
    }.filter(r => r._1 != r._2)
    val got = Preference.eloRatings(m.toDF("a", "b", "aw", "o"),
      col("a"), col("b"), col("aw"), Seq(col("o"))).collect()
    val totalDrift = got.map(_.getLong(1) - 1500L).sum
    assert(totalDrift == 0L) // zero-sum: gains equal losses exactly
    // reversing the order must change SOME rating (sequential, not
    // exchangeable like BT)
    val rev = Preference.eloRatings(m.toDF("a", "b", "aw", "o"),
      col("a"), col("b"), col("aw"), Seq(-col("o"))).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toMap !=
      rev.map(r => (r.getLong(0), r.getLong(1))).toMap)
  }

  test("eloRatings: bounded-fetch guard fails loudly past maxMatches") {
    val m = (0 until 30).map(i => (i.toLong % 5, (i + 1).toLong % 5,
      true, i.toLong)).filter(r => r._1 != r._2)
    val ex = intercept[IllegalArgumentException] {
      Preference.eloRatings(m.toDF("a", "b", "aw", "o"), col("a"),
        col("b"), col("aw"), Seq(col("o")), maxMatches = 10L)
    }
    assert(ex.getMessage.contains("bounded driver fold"))
  }

  test("gaeE6: hand trajectory with signed toward-zero truncation") {
    // r=[10,-40,30], v=[20,5,7], gamma=0.5, lambda=1, H=2:
    // deltas = [-8, -42, 23]; advantages = [-24, -31, 23]
    val steps = Seq((1L, 1L, 10L, 20L), (1L, 2L, -40L, 5L),
      (1L, 3L, 30L, 7L))
      .toDF("traj", "t", "r", "v")
    val out = Preference.gaeE6(steps, col("traj"), Seq(col("t")),
        col("r"), col("v"), gammaE6 = 500000L, lambdaE6 = 1000000L,
        horizon = 2)
      .orderBy("o0")
      .select("delta", "advantage")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((-8L, -24L), (-42L, -31L), (23L, 23L)))
  }

  test("gaeE6: horizon 0 collapses to the TD error; trajectories isolate") {
    val steps = Seq((1L, 1L, 100L, 10L), (1L, 2L, 50L, 20L),
      (2L, 1L, 7L, 3L))
      .toDF("traj", "t", "r", "v")
    val out = Preference.gaeE6(steps, col("traj"), Seq(col("t")),
        col("r"), col("v"), gammaE6 = 900000L, lambdaE6 = 950000L,
        horizon = 0)
      .orderBy("trajectory", "o0")
      .select("trajectory", "delta", "advantage")
      .as[(Long, Long, Long)].collect().toSeq
    // traj 1 t=1: 100 + 0.9*20 - 10 = 108; t=2: 50 - 20 = 30 (no leak
    // from traj 2); traj 2: 7 - 3 = 4
    assert(out == Seq((1L, 108L, 108L), (1L, 30L, 30L), (2L, 4L, 4L)))
  }

  test("temperatureWeightsE6: alpha=1 is proportional; alpha->small flattens") {
    val rows = (Seq.fill(900)("big") ++ Seq.fill(100)("small"))
      .map(Tuple1(_)).toDF("d")
    val w1 = Mixture.temperatureWeightsE6(rows, col("d"), alphaE6 = 1000000L)
      .select("domain", "share_e6", "samp_e6", "boost_e6")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(w1("big")._2 == 900000L && w1("big")._3 == 900000L)
    assert(w1("big")._4 == 1000000L && w1("small")._4 == 1000000L)
    val w5 = Mixture.temperatureWeightsE6(rows, col("d"), alphaE6 = 500000L)
      .select("domain", "samp_e6", "boost_e6")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // sqrt weights: 30 vs 10 -> 750000 / 250000; small up-samples 2.5x
    assert(w5("big")._2 == 750000L && w5("small")._2 == 250000L)
    assert(w5("small")._3 == 2500000L && w5("big")._3 == 833333L)
  }
}

