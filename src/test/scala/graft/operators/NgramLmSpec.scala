package graft.operators

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: add-one bigram with BOS, micro-nat rounding. */
  private def refScores(train: Seq[(Long, String)], docs: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    def pairs(text: String): Seq[(String, String)] = {
      val ts = "<s>" +: text.trim.toLowerCase.split("\\s+").toSeq
      ts.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val tp = train.flatMap(t => pairs(t._2))
    val cb = tp.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = tp.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = tp.map(_._2).distinct.size.toLong + 1
    docs.map { case (id, text) =>
      val lps = pairs(text).map { p =>
        math.round(math.log(
          (cb.getOrElse(p, 0L) + 1).toDouble /
            (cu.getOrElse(p._1, 0L) + v).toDouble) * 1e6)
      }
      id -> ((lps.size.toLong, -lps.sum / lps.size))
    }.toMap
  }

  test("bigram NLL matches the sequential model; fluent text scores lower") {
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog sat"))
    val docs = Seq(
      (10L, "the cat sat on the rug"), // in-domain: every bigram seen
      (11L, "rug mat dog zzz qqq"),    // OOV + unseen contexts
      (12L, "the")) :++ train          // single-token: one BOS pair
    val got = NgramLm
      .perplexityScore(train.toDF("doc_id", "text"), docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == refScores(train, docs))
    assert(got(10L)._2 < got(11L)._2,
      "in-domain text must score lower NLL than OOV gibberish")
  }

  test("scores are partition-invariant") {
    val docs = (0L until 60L).map(i =>
      (i, s"w${i % 7} w${(i * 3) % 5} w${(i * 7) % 11} w${i % 3}"))
    val train = docs.filter(_._1 % 2 == 0)
    def run(parts: Int) = NgramLm.perplexityScore(
        train.toDF("doc_id", "text").repartition(parts),
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(13))
  }

  test("kneserNeyTopE6: hand corpus matches the pinned arithmetic") {
    import spark.implicits._
    // docs: "a b", "a b", "a c" → pairs (<s>,a)×3, (a,b)×2, (a,c)×1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = NgramLm.kneserNeyTopE6(docs, "doc_id", "text",
        discountE6 = 750000L, topK = 25)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r)
      .toMap
    // (<s>,a): cu=3, fanout 1 → term1 = 2_250_000 div 3 = 750_000,
    //   λ = 250_000, pcont(a) = 1e6 div 3 = 333_333,
    //   pkn = 750_000 + 83_333 = 833_333
    val sa = got(("<s>", "a"))
    assert(sa.getLong(2) == 3L && sa.getLong(3) == 3L)
    assert(sa.getLong(4) == 1L && sa.getLong(5) == 1L)
    assert(sa.getLong(6) == 750000L && sa.getLong(7) == 250000L)
    assert(sa.getLong(8) == 333333L && sa.getLong(9) == 833333L)
    // (a,b): term1 = 1_250_000 div 3 = 416_666, λ = 500_000,
    //   pkn = 416_666 + 166_666 = 583_332
    val ab = got(("a", "b"))
    assert(ab.getLong(6) == 416666L && ab.getLong(7) == 500000L)
    assert(ab.getLong(9) == 583332L)
    // (a,c): term1 = 250_000 div 3 = 83_333, pkn = 249_999
    val ac = got(("a", "c"))
    assert(ac.getLong(6) == 83333L && ac.getLong(9) == 249999L)
    // discount mass identity for context a: Σ term1 = 499_999
    // ≈ (c − D·fanout)/c = 0.5, λ carries the removed 0.5
    assert(ab.getLong(6) + ac.getLong(6) == 499999L)
  }
}
