package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RichnessSpec extends SparkSpec {
  import spark.implicits._

  test("richnessProfileE6: hand-computed Chao1 and Good–Turing") {
    // g1: a a b c → N=4, D=3, F1=2, F2=1
    //   chao1 = 3e6 + 2·1·1e6 div (2·2) = 3_500_000
    //   gt = 2e6 div 4 = 500_000
    val toks = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "c"),
      // g2: all hapax → F2=0 stays defined (bias-corrected form)
      ("g2", "x"), ("g2", "y"))
      .toDF("g", "w")
    val got = Richness.richnessProfileE6(toks, col("g"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = got("g1")
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4)) ==
      ((4L, 3L, 2L, 1L)))
    assert(g1.getLong(5) == 3500000L)
    assert(g1.getLong(6) == 500000L && g1.getLong(7) == 500000L)
    // g2: N=2 D=2 F1=2 F2=0 → chao1 = 2e6 + 2·1·1e6 div 2 = 3e6;
    // unseen mass = 1e6 (everything is hapax), coverage 0
    val g2 = got("g2")
    assert(g2.getLong(5) == 3000000L)
    assert(g2.getLong(6) == 1000000L && g2.getLong(7) == 0L)
  }

  test("chapmanE6: hand samples with and without the truth audit") {
    import spark.implicits._
    // s1 = {1,2,3,4}, s2 = {3,4,5} (with dups to collapse), m = 2
    // chapman = 5·4·1e6 div 3 − 1e6 = 5_666_666
    val s1 = Seq(1L, 2L, 3L, 4L, 4L).toDF("k")
    val s2 = Seq(3L, 4L, 5L, 5L).toDF("k")
    val base = Richness.chapmanE6(s1, s2).collect().head
    assert((base.getLong(0), base.getLong(1), base.getLong(2)) ==
      ((4L, 3L, 2L)))
    assert(base.getLong(3) == 5666666L)

    val truth = Seq(6L).toDF("truth")
    val audited = Richness.chapmanE6(s1, s2, Some(truth)).collect().head
    assert(audited.getLong(4) == 6L)
    // err = |5_666_666 − 6_000_000|·1e6 div 6_000_000 = 55_555
    assert(audited.getLong(5) == 55555L)
  }

  private def pin(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("hillProfileE6: hand distribution at all three orders") {
    // g1: a×2, b×1, c×1 → N=4, D=3
    //   H terms (micro-nats): −.5 ln .5, −.25 ln .25 (×2)
    //   hill2 = 16e6 div (4+1+1) = 2_666_666
    val toks = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "c"),
      // g2: uniform over 2 types → hill1 = 2e6 exactly-ish, hill2 = 2e6
      ("g2", "x"), ("g2", "y"))
      .toDF("g", "w")
    val got = Richness.hillProfileE6(toks, col("g"), col("w"))
      .select("g", "n_tokens", "hill0", "shannon_e6", "hill1_e6",
        "hill2_e6")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val t1 = pin(-0.5 * math.log(0.5) * 1e6)
    val t2 = pin(-0.25 * math.log(0.25) * 1e6)
    val h1 = t1 + 2 * t2
    assert(got("g1") == (("g1", 4L, 3L, h1,
      pin(math.exp(h1 / 1e6) * 1e6), 2666666L)))
    val hu = 2 * pin(-0.5 * math.log(0.5) * 1e6)
    assert(got("g2") == (("g2", 2L, 2L, hu,
      pin(math.exp(hu / 1e6) * 1e6), 2000000L)))
  }

  test("goodTuringSmoothingE6: spectrum and the r+1 smoothing rule") {
    // counts: a×1 b×1 c×2 d×2 e×2 f×3 → N_1=2, N_2=3, N_3=1
    //   r*=1: 2·3·1e6 div 2 = 3e6;  r*=2: 3·1·1e6 div 3 = 1e6;
    //   r*=3: N_4=0 → 0
    val toks = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(2)("d") ++ Seq.fill(2)("e") ++ Seq.fill(3)("f"))
      .map(("g1", _)).toDF("g", "w")
    val got = Richness.goodTuringSmoothingE6(toks, col("g"), col("w"),
        maxR = 5)
      .select("r", "n_r", "r_star_e6")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(1L -> ((2L, 3000000L)), 2L -> ((3L, 1000000L)),
      3L -> ((1L, 0L))))
  }

  test("distinctNgramProfileE6: per-doc grams never span documents") {
    // two docs in one source: "a b a" and "b a"; distinct-1 = {a, b}
    // over 5 tokens; bigrams: "a b","b a" (doc1) + "b a" (doc2) →
    // 2 distinct of 3 total — "a b a"+"b a" would add a cross-doc gram
    // if grams spanned docs
    val docs = Seq(("s1", "a b a"), ("s1", "b a")).toDF("source", "text")
    val got = CorpusOps.distinctNgramProfileE6(docs, "source", "text", 2)
      .select("n", "total_grams", "distinct_grams", "distinct_e6")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 2L, 400000L)))
    assert(got(2L) == ((2L, 3L, 2L, 666666L)))
  }
}
