package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SummarizeSpec extends SparkSpec {
  import spark.implicits._

  test("luhnBest: band-pass significance, density argmax, tie to " +
      "the earlier sentence") {
    // census tokens keep punctuation ("b.", "a." are distinct types):
    // freqs a:1, b.:1, c:3, a.:1, z:1 → band [2,3] keeps {c} only
    val docs = Seq((1L, "a b. c c"), (2L, "c a. z"))
      .toDF("doc_id", "text")
    val got = Summarize.luhnBest(docs, "doc_id", "text",
        minFreq = 2L, maxFreq = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // doc 1: s0 "a b" → 0; s1 "c c" → 4·1e6/2 = 2e6
    assert(got(1L) == ((1L, 2L, 2L, 2000000L)))
    // doc 2: s0 "c a" → 1²·1e6/2 = 500000; s1 "z" → 0
    assert(got(2L) == ((0L, 1L, 2L, 500000L)))
  }
}
