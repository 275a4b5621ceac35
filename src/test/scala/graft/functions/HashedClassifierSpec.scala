package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The single-pass kernel must agree with a naive two-step reference
  * (split to ngram strings, hash each whole string) — in particular the
  * bigram mod-homomorphism fold vs hashing the concatenated string. */
class HashedClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val maskBits = 20
  private val mask = (1L << maskBits) - 1
  private val seed = 42L

  /** Reference: materialize each ngram string, hash it independently. */
  private def naiveScore(text: String, bigrams: Boolean): Long = {
    val tk = text.trim.split("\\s+").filter(_.nonEmpty)
    val grams = tk.toSeq ++
      (if (bigrams) tk.toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" "))
       else Seq.empty)
    grams.map { g =>
      val b = RollingHash.polyHash64(g.getBytes("UTF-8")) & mask
      HashedClassifierOps.proceduralWeight(b, seed)
    }.sum
  }

  private def kernel(text: String, bigrams: Boolean): Long =
    HashedClassifierOps.score(UTF8String.fromString(text), maskBits, seed,
      bigrams, null)

  test("kernel matches the naive per-ngram-string reference") {
    val cases = Seq(
      "the quick brown fox",
      "single",
      "  leading and   irregular \t whitespace \n newlines too  ",
      "a b a b a b",
      "x")
    for (c <- cases; bg <- Seq(true, false)) {
      assert(kernel(c, bg) == naiveScore(c, bg), s"'$c' bigrams=$bg")
    }
  }

  test("kernel matches the reference on the real corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
    HashedClassifier.register(spark)
    val viaSpark = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), HashedClassifier.hashedNgramScore(
        col("text"), maskBits, seed, bigrams = true).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { r =>
      assert(viaSpark(r.getLong(0)) == naiveScore(r.getString(1), bigrams = true),
        s"doc ${r.getLong(0)}")
    }
    // the procedural weights genuinely split this corpus
    val accepts = viaSpark.values.count(_ >= 0)
    assert(accepts > 0 && accepts < viaSpark.size)
  }

  test("empty and whitespace-only inputs score 0; null propagates") {
    assert(kernel("", bigrams = true) == 0L)
    assert(kernel("   \t\n ", bigrams = true) == 0L)
    HashedClassifier.register(spark)
    val r = Seq((1L, null: String)).toDF("id", "text")
      .select(HashedClassifier.hashedNgramScore(col("text"), maskBits, seed,
        bigrams = true).as("s")).collect()
    assert(r.head.isNullAt(0))
  }

  test("trained-table variant: identity table reproduces procedural scores") {
    HashedClassifier.register(spark)
    val table = Array.tabulate(1 << maskBits)(b =>
      HashedClassifierOps.proceduralWeight(b.toLong, seed).toInt)
    val df = Seq((1L, "the quick brown fox jumps"), (2L, "pack my box"))
      .toDF("id", "text")
    val both = df.select(col("id"),
      HashedClassifier.hashedNgramScore(col("text"), maskBits, seed, bigrams = true).as("p"),
      HashedClassifier.hashedNgramScoreTable(col("text"), maskBits, table, bigrams = true).as("t"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getLong(0)))

    // a different table changes the verdicts — the weights are really read
    val zero = Array.fill(1 << maskBits)(0)
    val z = df.select(HashedClassifier.hashedNgramScoreTable(
      col("text"), maskBits, zero, bigrams = true).as("t")).collect()
    z.foreach(r => assert(r.getLong(0) == 0L))
  }
}
