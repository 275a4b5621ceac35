package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("fleschKincaid: hand-computed counts and e3 indices") {
    // doc1: 5 words, 2 sentences, 5 syllables
    // doc2: 2 words ("hello" = 2 vowel groups, "rhythm" = 1 via y),
    //       no punctuation → 1 sentence (min-clamp)
    val docs = Seq(("s", "The cat sat. It ran!"), ("s", "hello rhythm"))
      .toDF("source", "text")
    val r = Readability.fleschKincaid(docs, col("text"), Seq("source"))
      .collect().head
    assert(r.getString(0) == "s" && r.getLong(1) == 2L)
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((7L, 3L, 8L)))
    assert(r.getLong(5) == 2333L && r.getLong(6) == 1142L)
    // flesch = 206835 − 1015·7 div 3 − 84600·8 div 7 = 107782
    assert(r.getLong(7) == 107782L)
    // fk = 390·7 div 3 + 11800·8 div 7 − 15590 = −1195
    assert(r.getLong(8) == -1195L)
  }

  test("vowel-less words clamp to one syllable; empty tokens drop") {
    val docs = Seq(("s", "  tsk   brr  ")).toDF("source", "text")
    val r = Readability.fleschKincaid(docs, col("text"), Seq("source"))
      .collect().head
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L && r.getLong(4) == 2L)
  }

  test("plan: no generator below the group aggregate (tokens stay in-array)") {
    val plan = Readability.fleschKincaid(
        Seq(("s", "a b. c")).toDF("source", "text"), col("text"),
        Seq("source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan.take(800))
    assert(!plan.contains("WindowExec"), plan.take(800))
  }

  test("group census is partitioning-invariant") {
    val rows = (0 until 500).map(i =>
      (s"src${i % 4}", s"word$i text. more words number $i!"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Readability.fleschKincaid(df, col("text"), Seq("source"))
        .collect().map(_.toString).sorted.mkString("|")
    assert(run(rows.toDF("source", "text").repartition(1)) ==
      run(rows.reverse.toDF("source", "text").repartition(13)))
  }
}
