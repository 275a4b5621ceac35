package graft.operators

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("two EM rounds replay by hand on an ab-corpus") {
    // words: abab (cnt 2), ab (cnt 1); pieceMaxLen 2, vocabSize 3 →
    // vocab {a:5, b:5, ab:5} (ba's 2 loses the top-3 cut).
    // v0: all ln(1/3). Viterbi picks ab+ab / ab (fewest pieces at equal
    // logp) → counts ab=5, a=0, b=0; Laplace → 6/1/1 over 8.
    val docs = Seq("abab abab ab").toDF("text")
    val got = UnigramLm.train(docs, "text", vocabSize = 3,
        pieceMaxLen = 2, maxWordLen = 8, emRounds = 2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    def lp(n: Long, t: Long): Long =
      math.round(math.log(n.toDouble / t.toDouble) * 1e6)
    assert(got.keySet == Set("a", "b", "ab"))
    assert(got("ab") == ((5L, lp(6, 8))))
    assert(got("a") == ((0L, lp(1, 8))))
    assert(got("b") == ((0L, lp(1, 8))))
  }

  test("char coverage keeps rare words segmentable") {
    // "zq" appears once and none of its substrings make the top cut,
    // but single chars always enter the vocabulary
    val docs = Seq(("aaaa aaaa aaaa zq")).toDF("text")
    val got = UnigramLm.train(docs, "text", vocabSize = 2,
        pieceMaxLen = 2, maxWordLen = 8, emRounds = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("z") && got.contains("q"))
    assert(got("z") == 1L && got("q") == 1L) // zq segments as z+q
  }

  test("training is invariant to document partitioning") {
    val syll = Array("ka", "ro", "mi", "ten", "lu", "ba", "zo", "qi", "fe")
    val docs = (0 until 120).map(i =>
      Seq.fill(3)(s"${syll(i % 9)}x tail${syll(i % 4)}").mkString(" "))
    val one = UnigramLm.train(docs.toDF("text").repartition(1), "text",
        vocabSize = 20, pieceMaxLen = 3, maxWordLen = 8, emRounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val many = UnigramLm.train(
        docs.reverse.toDF("text").repartition(13), "text",
        vocabSize = 20, pieceMaxLen = 3, maxWordLen = 8, emRounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(one == many && one.nonEmpty)
  }

  test("encode: Viterbi piece counts under the trained model") {
    val docs = Seq("abab abab ab").toDF("text")
    val v = UnigramLm.train(docs, "text", vocabSize = 3,
        pieceMaxLen = 2, maxWordLen = 8, emRounds = 2)
      .select(org.apache.spark.sql.functions.col("piece"),
        org.apache.spark.sql.functions.col("logp_e6"))
    val got = UnigramLm.wordPieceCounts(docs, "text", v,
        pieceMaxLen = 2, maxWordLen = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("abab" -> 2L, "ab" -> 1L)) // ab+ab / ab
  }
}
