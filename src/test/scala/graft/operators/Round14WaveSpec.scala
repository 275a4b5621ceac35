package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed unit fixtures for the round-14 wave operators that are
  * otherwise oracle-gated only (Page's L, Ansari–Bradley, Schnabel,
  * Brown–Forsythe). */
class Round14WaveSpec extends SparkSpec {
  import spark.implicits._

  private def pin(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("pageTrendE6: perfect monotone trend hits the exact maximum") {
    // 3 complete blocks, values strictly increasing with treatment →
    // per-block mr2 = (2, 4, 6), L2 = 28 each; block b4 is incomplete
    // (2 treatments) and must DROP
    val rows = (1 to 3).flatMap(b => Seq((s"b$b", 1L, 10L + b),
      (s"b$b", 2L, 20L + b), (s"b$b", 3L, 30L + b))) ++
      Seq(("b4", 1L, 5L), ("b4", 2L, 6L))
    val out = OrdinalTests.pageTrendE6(rows.toDF("b", "t", "v"),
        col("b"), col("t"), col("v"), k = 3)
      .select("n_blocks", "k", "l2", "e_l2", "z_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1)
    val (n, k, l2, e, z) = out(0)
    assert((n, k, l2, e) == ((3L, 3L, 84L, 72L)))
    // z = (84 − 72)·6 / (3·√(3·4·8))
    assert(z == pin((84.0 - 72.0) * 6.0 / (3 * math.sqrt(3.0 * 4 * 8))
      * 1e6))
  }

  test("pageTrendE6: within-block ties take doubled midranks") {
    // one block, values (5, 5, 9): ranks (1,1,3) → mr2 = (3, 3, 6);
    // L2 = 1·3 + 2·3 + 3·6 = 27
    val rows = Seq(("b1", 1L, 5L), ("b1", 2L, 5L), ("b1", 3L, 9L))
    val out = OrdinalTests.pageTrendE6(rows.toDF("b", "t", "v"),
        col("b"), col("t"), col("v"), k = 3)
      .select("n_blocks", "l2").as[(Long, Long)].collect()
    assert(out(0) == ((1L, 27L)))
  }

  test("ansariBradleyE6: hand scores on a pooled census with ties") {
    // X = {1, 9}, Y = {5, 5}: pooled sorted (1, 5, 5, 9), N = 4
    //   doubled midranks mr2 = 2·cumBelow + ties + 1:
    //   v=1 → 2; v=5 → 5 (midrank 2.5); v=9 → 8
    //   fold bound 2(N+1) = 10 → a2 = min(mr2, 10−mr2): (2, 5, 2)
    //   AB2 = 2 + 2 = 4 (X at the extremes scores low = more spread);
    //   S = 2 + 5·2 + 2 = 14; S2 = 4 + 25·2 + 4 = 58
    val rows = Seq((true, 1L), (true, 9L), (false, 5L), (false, 5L))
    val out = Dispersion.ansariBradleyE6(rows.toDF("x", "v"),
        col("x"), col("v"))
      .select("n_x", "n_y", "ab2", "e_ab2_e6", "z_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
    val (nx, ny, ab2, eab, z) = out(0)
    assert((nx, ny, ab2) == ((2L, 2L, 4L)))
    assert(eab == 2L * 14L * 1000000L / 4L)
    val vnum = 2.0 * 2 * (4 * 58 - 14 * 14).toDouble
    assert(z == pin((4.0 - 2.0 * 14.0 / 4.0) /
      math.sqrt(vnum / (4.0 * 4.0 * 3.0)) * 1e6))
  }

  test("schnabelTrajectoryE6: hand occasions converge on the estimate") {
    // occ 1: {a,b}; occ 2: {b,c}; occ 3: {a,c,d}
    val rows = Seq(("a", 1L), ("b", 1L), ("b", 2L), ("c", 2L),
      ("a", 3L), ("c", 3L), ("d", 3L), ("d", 3L)) // dup collapses
    val out = CaptureRecapture.schnabelTrajectoryE6(
        rows.toDF("u", "t"), col("u"), col("t"))
      .select("t", "c_t", "r_t", "m_t", "cum_cm", "cum_r", "nhat_e6")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 0L, 0L, 0L, 0L, 0L),
      (2L, 2L, 1L, 2L, 4L, 1L, 4000000L),
      (3L, 3L, 2L, 3L, 13L, 3L, 13000000L / 3L)))
  }

  test("brownForsytheE6: two hand groups through the floored F chain") {
    // g1 = (1,3,5): med 3, z = (2,0,2), S=4, Q=8, ⌊16/3⌋ = 5
    // g2 = (10,10,20,40): pinned order stat (2cum ≥ n+1) → med 20,
    //   z = (10,10,0,20), S=40, Q=600, ⌊1600/4⌋ = 400
    // st=405, S=44, N=7 → ⌊1936/7⌋ = 276; A=129, B=608−405=203
    // F_e6 = 5·129·1e6 div 203 = 3177339
    val rows = Seq(("g1", 1L), ("g1", 3L), ("g1", 5L),
      ("g2", 10L), ("g2", 10L), ("g2", 20L), ("g2", 40L))
    val out = Dispersion.brownForsytheE6(rows.toDF("g", "v"),
        col("g"), col("v"))
      .selectExpr("n", "k", "CAST(a_ss AS STRING)", "CAST(b_ss AS STRING)",
        "f_e6")
      .as[(Long, Long, String, String, Long)].collect()
    assert(out(0) == ((7L, 2L, "129", "203", 3177339L)))
  }

  // a: hit every epoch; b: hit-miss-hit; c: seen only at epoch 1, no hit
  // (grid zero-fills epochs 2 and 3 for it)
  private val dynRows = Seq(
    ("a", 1L, true), ("a", 2L, true), ("a", 3L, true),
    ("b", 1L, true), ("b", 2L, false), ("b", 3L, true),
    ("c", 1L, false))

  test("cartographyE6: hand map regions with the exact isqrt variability") {
    val out = TrainingDynamics.cartographyE6(dynRows.toDF("u", "ep", "h"),
        col("u"), col("ep"), col("h"))
      .select("conf_bucket", "var_bucket", "region", "n_examples")
      .as[(Long, Long, String, Long)].collect().toSet
    // b: s=2, n=3 → conf = 666666; v = 2e12 div 9 = 222222222222,
    // isqrt = 471404 → ambiguous (> 400000)
    val vb = BigInt("222222222222")
    val s0 = BigInt(math.sqrt(vb.toDouble).toLong)
    val isq = if (s0 * s0 > vb) s0 - 1
              else if ((s0 + 1) * (s0 + 1) <= vb) s0 + 1 else s0
    assert(isq == 471404L && isq.toLong / 100000L == 4L)
    assert(out == Set((10L, 0L, "easy_to_learn", 1L),
      (6L, 4L, "ambiguous", 1L), (0L, 0L, "hard_to_learn", 1L)))
  }

  test("forgettingCensus: transition counts over the zero-filled grid") {
    val out = TrainingDynamics.forgettingCensus(dynRows.toDF("u", "ep", "h"),
        col("u"), col("ep"), col("h"))
      .select("n_forget", "ever_learned", "n_examples")
      .as[(Long, Boolean, Long)].collect().toSet
    // a: unforgettable; b: one 1→0 transition; c: never learned
    assert(out == Set((0L, true, 1L), (1L, true, 1L), (0L, false, 1L)))
  }

  test("rougeE6 + bleu2E6: clipped-overlap hand pair") {
    // ref "the cat sat" vs cand "the cat the": o1 = 2 (clipped), o2 = 1
    val pairs = Seq(("s1", 1L, "the cat sat", "the cat the"))
      .toDF("source", "pr", "ref_t", "cand_t")
    val rg = TextEval.rougeE6(pairs, Seq("source", "pr"),
        col("ref_t"), col("cand_t"))
      .select("rouge1_recall_e6", "rouge1_precision_e6", "rouge1_f1_e6",
        "rouge2_recall_e6", "rouge2_precision_e6", "rouge2_f1_e6")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rg(0) == ((666666L, 666666L, 666666L,
      500000L, 500000L, 500000L)))
    val bl = TextEval.bleu2E6(pairs, Seq("source", "pr"),
        col("ref_t"), col("cand_t"))
      .select("o_1", "o_2", "ref_len", "cand_len", "bleu2_e6")
      .as[(Long, Long, Long, Long, Long)].collect()
    // BP = 1 (cand_len = ref_len); bleu = √(2/3 · 1/2)
    assert(bl(0) == ((2L, 1L, 3L, 3L,
      pin(math.sqrt((2.0 / 3) * 0.5) * 1e6))))
  }

  test("editDistancePairs: the classic kitten/sitting distance") {
    val pairs = Seq(("s1", 1L, "kitten", "sitting"))
      .toDF("source", "pr", "a", "b")
    val out = TextEval.editDistancePairs(pairs, Seq("source", "pr"),
        col("a"), col("b"), capChars = 200)
      .select("len_a", "len_b", "dist", "norm_e6")
      .as[(Long, Long, Long, Long)].collect()
    assert(out(0) == ((6L, 7L, 3L, 3000000L / 7L)))
  }

  test("durbinWatsonE6: alternating residuals give the hand DW") {
    // x = 0..3, y = (0,1,0,1): b = 4/20, residuals (−.2,.6,−.6,.2) →
    // E3 = (−200,600,−600,200); DW = 2720000/800000 = 3.4
    val out = Trend.durbinWatsonE6(
        Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L)).toDF("x", "y"),
        col("x"), col("y"))
      .as[(Long, Option[Long])].collect()
    assert(out(0) == ((4L, Some(3400000L))))
    // a perfectly linear series has zero residuals → NULL DW
    val flat = Trend.durbinWatsonE6(
        Seq((0L, 5L), (1L, 7L), (2L, 9L)).toDF("x", "y"),
        col("x"), col("y"))
      .as[(Long, Option[Long])].collect()
    assert(flat(0) == ((3L, None)))
  }

  test("gwetAc1E6: skewed-prevalence hand table") {
    // 4 items × 2 raters: three (a,a) + one (a,b) →
    // pa = 6/8; P = 8, C = 64 − 50 = 14, D = 64 → pe = 218750;
    // AC1 = 272e6/400 = 680000
    val rows = Seq(("i1", "r1", "a"), ("i1", "r2", "a"),
      ("i2", "r1", "a"), ("i2", "r2", "a"),
      ("i3", "r1", "a"), ("i3", "r2", "a"),
      ("i4", "r1", "a"), ("i4", "r2", "b"))
    val out = Preference.gwetAc1E6(rows.toDF("i", "r", "c"),
        col("i"), col("r"), col("c"), raters = 2)
      .select("n_items", "q_cats", "pbar_e6", "pe_e6", "ac1_e6")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(out(0) == ((4L, 2L, 750000L, Some(218750L), Some(680000L))))
  }

  test("iccOneWayE6: perfect within-target agreement gives ICC = 1") {
    val rows = Seq(("t1", 1L), ("t1", 1L), ("t2", 5L), ("t2", 5L),
      ("t3", 9L), ("t3", 9L), ("t4", 3L)) // t4 incomplete → dropped
    val out = Preference.iccOneWayE6(rows.toDF("i", "x"),
        col("i"), col("x"), k = 2)
      .select("n_targets", "k", "n_dropped", "icc_e6")
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(out(0) == ((3L, 2L, 1L, Some(1000000L))))
  }

  test("yuenTrimmedTE6: hand samples through the exact trim/winsorize") {
    // x = 0..9 (n=10, g=1, h=8): trimmed sum 36, winsorized to rank-2/
    // rank-9 values (1, 8) → wsum 45, wss 269, ssdwn 10·269−45² = 665
    // y = three 0s + three 10s (n=6, g=0): ts 30, ssdwn 6·300−900 = 900
    val rows = (0 to 9).map(v => (true, v.toLong)) ++
      Seq.fill(3)((false, 0L)) ++ Seq.fill(3)((false, 10L))
    val out = OrdinalTests.yuenTrimmedTE6(rows.toDF("b", "v"),
        col("b"), col("v"), trimPerMille = 100)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val (nx, hx, tmx, ny, hy, tmy, t) = out(0)
    assert((nx, hx, tmx) == ((10L, 8L, 4500000L)))
    assert((ny, hy, tmy) == ((6L, 6L, 5000000L)))
    assert(t == pin((36.0 / 8 - 30.0 / 6) /
      math.sqrt(665.0 / (10 * 8 * 7) + 900.0 / (6 * 6 * 5)) * 1e6))
  }

  test("facilityLocationSelectE6: greedy coverage picks the hub first") {
    // v1 = (1,0), v2 = (1,0) dup, v3 = (0,1), v4 ≈ (.7,.7) hub:
    // clamped sims: hub covers everything ≥ ~0.707e6, so round 1 picks
    // the hub (Σsim max); round 2 adds the orthogonal axis with the
    // larger residual
    val rows = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.7f, 0.7f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.facilityLocationSelectE6(df, "vec_id",
        "embedding", col("vec_id") <= 4L, selectK = 3)
      .select("pick_rank", "cid", "gain_e6", "objective_e6")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(4L, 1L, 3L),
      s"expected hub, then the duplicated axis, then the other: $out")
    // objective is the running gain sum and never decreases in steps
    assert(out.map(_._4) == out.map(_._3).scanLeft(0L)(_ + _).tail)
    // first gain = Σ_v sim(v, hub) incl. its own exact 1e6 self-sim
    assert(out(0)._3 > 3000000L && out(0)._3 <= 4000000L)
  }

  test("facilityLocationSelectE6: pool guard trips loudly") {
    val df = (1 to 70).map(i => (i.toLong, Array(1.0f, i.toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.facilityLocationSelectE6(df, "vec_id", "embedding",
        lit(true), selectK = 3)
    }
    assert(e.getMessage.contains("pool has 70"))
  }

  test("TrainingDynamics rejects a data-grain epoch column loudly") {
    val df = spark.range(1001).selectExpr("'u1' AS u", "id AS ep",
      "true AS h")
    val e = intercept[IllegalArgumentException] {
      TrainingDynamics.forgettingCensus(df, col("u"), col("ep"),
        col("h")).count()
    }
    assert(e.getMessage.contains("checkpoint-grain"))
  }

  test("chrFE6: hand char-gram pair with whitespace stripping") {
    // ref "ab ab" -> "abab", cand "A ab" -> "aab" (lowercased), maxN=2:
    //  n=1: o=3, c=3, r=4 -> p=1e6, r=750000
    //  n=2: cand grams {aa, ab}, ref {ab:2, ba} -> o=1, c=2, r=3
    //       -> p=500000, r=333333
    //  P=(1e6+5e5) div 2 = 750000; R=(750000+333333) div 2 = 541666
    //  F2 = 5·P·R div (4P + R) = 573528
    val pairs = Seq(("s1", 1L, "ab ab", "A ab"))
      .toDF("source", "pr", "ref_t", "cand_t")
    val out = TextEval.chrFE6(pairs, Seq("source", "pr"),
        col("ref_t"), col("cand_t"), maxN = 2)
      .select("chrp_e6", "chrr_e6", "chrf2_e6")
      .as[(Long, Long, Long)].collect()
    assert(out(0) == ((750000L, 541666L, 573528L)))
  }

  test("chrFE6: identical texts score 1e6; disjoint score 0") {
    val pairs = Seq(
      ("s1", 1L, "same text here", "same text here"),
      ("s1", 2L, "aaaa", "bbbb"))
      .toDF("source", "pr", "ref_t", "cand_t")
    val out = TextEval.chrFE6(pairs, Seq("source", "pr"),
        col("ref_t"), col("cand_t"), maxN = 3)
      .orderBy("pr")
      .select("chrp_e6", "chrr_e6", "chrf2_e6")
      .as[(Long, Long, Long)].collect()
    assert(out(0) == ((1000000L, 1000000L, 1000000L)))
    assert(out(1) == ((0L, 0L, 0L)))
  }

  test("chrFE6: an empty side zero-fills instead of dropping the pair") {
    val pairs = Seq(("s1", 1L, "some reference", " "))
      .toDF("source", "pr", "ref_t", "cand_t")
    val out = TextEval.chrFE6(pairs, Seq("source", "pr"),
        col("ref_t"), col("cand_t"))
      .select("chrp_e6", "chrr_e6", "chrf2_e6")
      .as[(Long, Long, Long)].collect()
    assert(out.length == 1 && out(0) == ((0L, 0L, 0L)))
  }
}

