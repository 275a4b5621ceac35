package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount collapses whitespace runs and trims") {
    val got = Seq("  a  b\tc ", "x", "").toDF("t")
      .select(TextFunctions.tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 1, 1)) // empty → [""] (1 token), callers filter
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("The  Quick Fox", "the quick fox ").toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("langIdHeuristic detects marker-heavy text") {
    val got = Seq(
      "the cat and the dog of it is that",
      "el perro y la casa de los campos",
      "der hund und die katze ist nicht da",
      "zzz qqq www").toDF("t")
      .select(TextFunctions.langIdHeuristic(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "es", "de", "und"))
  }

  test("qualityScore bounded [0,100] and favors diverse text") {
    val got = Seq(
      ("rich", "a wide variety of distinct meaningful words compose this sentence"),
      ("poor", "spam spam spam spam spam spam spam spam spam spam"))
      .toDF("name", "t")
      .select(col("name"), TextFunctions.qualityScore(col("t")).as("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("rich") > got("poor"))
    assert(got.values.forall(q => q >= 0 && q <= 100))
  }
}
