package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, phrase: Seq[String]) =
    PhraseIndex.phraseMatches(Seq((1L, text)).toDF("id", "txt"),
      col("id"), col("txt"), phrase).collect()

  test("overlapping matches all count (repeated-term phrase)") {
    // "a a a a" vs phrase "a a": starts 1,2,3 → 3 overlapping matches
    val r = run("a a a a", Seq("a", "a"))
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_matches") == 3L)
    assert(r.head.getAs[Long]("first_pos") == 1L)
  }

  test("phrase must be consecutive — gaps don't match") {
    assert(run("row x column sort", Seq("row", "column", "sort")).isEmpty)
    val r = run("x row column sort y", Seq("row", "column", "sort"))
    assert(r.head.getAs[Long]("first_pos") == 2L)
  }

  test("multiple docs aggregate independently") {
    val df = Seq((1L, "b c b c b c"), (2L, "b c"), (3L, "c b"))
      .toDF("id", "txt")
    val got = PhraseIndex.phraseMatches(df, col("id"), col("txt"),
        Seq("b", "c"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_matches"))
      .toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }
}
