package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    ("the quick brown fox jumps over that lazy dog and friends " * 6).trim

  test("per-rule booleans fire on the engineered violations") {
    val docs = Seq(
      (1L, goodText),                                   // passes everything
      (2L, "too few words of the and that"),            // word count
      (3L, ("a b c d " * 20).trim + " the of"),         // mean word len < 3
      (4L, Seq.fill(60)("###").mkString(" ") + " the of be"), // symbols+alpha
      (5L, (0 until 10).map(i => s"- bullet $i the of").mkString("\n") +
        "\n" + goodText.take(0)),                       // >90% bullet lines
      (6L, (0 until 10).map(i => s"line $i the of be ...").mkString("\n")), // ellipsis ends
      (7L, ("12345 67890 " * 30).trim + " the of"),     // <80% alpha words
      (8L, ("zebra quagga okapi " * 20).trim))          // <2 stop words
      .toDF("doc_id", "text")
    val got = GopherRules.decisions(docs, "doc_id", "text", minWords = 20L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(got(1L).fieldIndex("pass")))
    def failedOn(id: Long, rule: String): Unit = {
      assert(!got(id).getBoolean(got(id).fieldIndex(rule)), s"doc $id $rule")
      assert(!got(id).getBoolean(got(id).fieldIndex("pass")))
    }
    failedOn(2L, "ok_word_count")
    failedOn(3L, "ok_mean_word_len")
    failedOn(4L, "ok_symbol_ratio")
    failedOn(5L, "ok_bullet_lines")
    failedOn(6L, "ok_ellipsis_lines")
    failedOn(7L, "ok_alpha_words")
    failedOn(8L, "ok_stop_words")
  }

  test("integer threshold edges: exactly-at-boundary docs pass") {
    // mean word length exactly 3 and exactly 10 chars/word
    val at3 = (1L, ("abc " * 25).trim + " the of") // 27 words: 25*3+3+2=80... compute below
    val docs = Seq(
      (1L, (Seq.fill(24)("abc") ++ Seq("the", "off", "bee")).mkString(" ")), // 27 words á 3 chars
      (2L, (Seq.fill(24)("abcdefghij") ++ Seq("theabcdefg", "beeabcdefg",
        "ofabcdefgh")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = GopherRules.decisions(docs, "doc_id", "text", minWords = 10L)
      .select("doc_id", "ok_mean_word_len").as[(Long, Boolean)].collect().toMap
    assert(got(1L) && got(2L))
  }

  test("composed filter stack runs as ONE scan with zero exchanges") {
    graft.functions.Blocklist.register(spark)
    graft.functions.CharEntropyFn.register(spark)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val base = docs.select(col("doc_id"), col("text"),
      graft.functions.Blocklist.blocklistHits(
        trim(lower(col("text"))), Seq("scan", "row")).as("n_hits"),
      graft.functions.CharEntropyFn.charEntropy(col("text")).as("entropy_micro"))
    val stack = GopherRules.decisions(base, "doc_id", "text",
        minWords = 20L, carry = Seq("n_hits", "entropy_micro"))
      .withColumn("keep", col("pass") && col("n_hits") === 0L &&
        col("entropy_micro") >= 2500000L)
    val plan = stack.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stack must not shuffle:\n${plan.take(1500)}")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"stack must read the corpus once:\n${plan.take(1500)}")
    // carried columns survive next to the rule booleans
    assert(stack.columns.toSet.contains("n_hits") &&
      stack.columns.contains("entropy_micro"))
    assert(stack.count() > 0)
  }
}
