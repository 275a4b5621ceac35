package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The kernel must be SET-equal to the declarative chain it replaced:
  * split(trim(text), "\s+") → n-grams → array_distinct. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(textCol: org.apache.spark.sql.Column, n: Int) = {
    val toks = split(trim(textCol), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  test("kernel matches declarative shingling on varied inputs") {
    WordShingles.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c", "a b", "", "  padded   spaces  ", "one",
      "rep rep rep rep rep", "x\ty\nz w v", " lead tab\tmix  end ")
    val df = texts.toDF("t").select(
      sort_array(WordShingles.wordShingles(col("t"), 3)).as("kernel"),
      sort_array(declarative(col("t"), 3)).as("decl"))
    df.collect().zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"for '$t'")
    }
  }

  test("n=2 and long-doc parity") {
    WordShingles.register(spark)
    val doc = (1 to 200).map(i => s"w${i % 37}").mkString(" ")
    val r = Seq(doc).toDF("t").select(
      sort_array(WordShingles.wordShingles(col("t"), 2)).as("kernel"),
      sort_array(declarative(col("t"), 2)).as("decl")).head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }
}
