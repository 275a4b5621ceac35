package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must agree with a from-scratch sequential
  * reference implementation (Sennrich et al. 2016 semantics: weighted pair
  * counts, ties to the lexicographically lowest pair, greedy left-to-right
  * merge application). */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def refMergeOnce(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Map[String, Long], k: Int)
      : (List[(String, String, Long)], Map[String, List[String]]) = {
    var vocab = words.map { case (w, c) => w -> w.map(_.toString).toList }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        syms.zip(syms.tail).foreach(p =>
          pairCnt(p) = pairCnt.getOrElse(p, 0L) + words(w))
      }
      if (pairCnt.nonEmpty) {
        val ((l, r), c) = pairCnt.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        vocab = vocab.map { case (w, syms) => w -> refMergeOnce(syms, l, r) }
      }
    }
    (merges.toList, vocab)
  }

  test("mergeOnce is greedy left-to-right; a fresh merge never re-merges") {
    val df = Seq("aaaa", "aaa", "aba", "bb").toDF("word")
      .select(col("word"), BpeTrainer.mergeOnce(
        BpeTrainer.charSymbols(col("word")), "a", "a").as("syms"))
    val got = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("aaaa") == List("aa", "aa"))
    assert(got("aaa") == List("aa", "a"))
    assert(got("aba") == List("a", "b", "a"))
    assert(got("bb") == List("b", "b"))
  }

  test("trainMerges matches the sequential reference on the real corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val words = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 8
    val got = BpeTrainer.trainMerges(wc, k)
    val (exp, expVocab) = refTrain(words, k)
    assert(got.map(m => (m.left, m.right, m.count)) == exp)

    // merged vocabulary agrees symbol-for-symbol
    val gotVocab = wc.select(col("word"),
      BpeTrainer.applyMerges(BpeTrainer.charSymbols(col("word")), got).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    expVocab.foreach { case (w, syms) => assert(gotVocab(w) == syms, w) }
  }

  test("bpeTokenCounts matches a per-doc reference sum") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val words = BpeTrainer.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, vocab) = refTrain(words, 8)
    val exp = docs.select(col("doc_id"), col("text")).collect().map { r =>
      r.getLong(0) -> r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .map(w => vocab(w).size.toLong).sum
    }.toMap
    val got = BpeTrainer.bpeTokenCounts(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
    // merges genuinely compress: strictly fewer tokens than characters
    val chars = docs.select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .collect().head.getLong(0)
    assert(got.values.sum < chars)
  }

  test("encode applies merges greedily left-to-right, per rank") {
    // hand-computed folds, incl. the overlapping-run and chained-symbol
    // cases where naive string replacement diverges from BPE
    val docs = Seq((1L, "aaaa abab banana"), (2L, "  "), (3L, "banana aaaa"))
      .toDF("doc_id", "text")
    val got = BpeTrainer.encode(docs, "doc_id", "text",
        Seq("a" -> "a", "a" -> "b", "b" -> "an"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // aaaa → (aa)(aa); abab → (ab)(ab); banana untouched (no 'an' symbol
    // exists — (b,an) only fires on a prior (a,n) merge)
    assert(got(1L) == ((10L, "aa aa ab ab b a n a n a")))
    assert(!got.contains(2L), "whitespace-only doc must drop")
    assert(got(3L) == ((8L, "b a n a n a aa aa")))

    val chained = BpeTrainer.encode(docs, "doc_id", "text",
        Seq("a" -> "n", "b" -> "an"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // banana: (a,n) → b(an)(an)a? no — fold: [b,an,an,a]; then (b,an) →
    // [ban,an,a]
    assert(chained(1L) == "a a a a a b a b ban an a")
    assert(chained(3L) == "ban an a a a a a")
  }

  test("encode is partition-invariant") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ms = Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r",
      "s" -> "t", "m" -> "er", "a" -> "t", "l" -> "u")
    def run(parts: Int) = BpeTrainer
      .encode(docs.repartition(parts), "doc_id", "text", ms)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(7))
  }
}
