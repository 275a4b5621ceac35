package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", §A1.1 —
  * public paper; thresholds below are the paper's): the standard
  * rule-bundle pre-filter an LLM data pipeline runs before dedup, emitted
  * as a PER-RULE boolean decision table (pipelines audit which rule fired,
  * not just that something did).
  *
  * Every signal is an `org.apache.spark.sql.functions` composition over
  * one scan — codegen'd, no UDFs, no shuffle at all until the caller
  * aggregates — and every ratio threshold is decided in integer cross-
  * multiplication, so the table replays exactly in the SQL oracle.
  *
  * Rules (doc passes when ALL hold):
  *  - word count in [minWords, maxWords]            (paper: 50..100k)
  *  - mean word length in [minMeanLen, maxMeanLen]  (paper: 3..10, decided
  *    as chars·den vs words·num in integers)
  *  - symbol-to-word ratio ≤ 1/10 (hash + ellipsis)
  *  - bullet-start lines ≤ 90%, ellipsis-end lines ≤ 30%
  *  - ≥ 80% of words contain an alphabetic character
  *  - ≥ 2 distinct stop words present
  */
object GopherRules {

  val stopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Decision table: doc_id, the per-rule booleans, and `pass`. `carry`
    * names input columns to pass through unchanged — how the composed
    * filter stack (q107) keeps sibling-family signals (blocklist hits,
    * entropy) riding the SAME single scan instead of re-reading the
    * corpus per family. */
  def decisions(docs: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      carry: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val words = TextFunctions.tokens(text)
    val nWords = size(words).cast("long")
    val nChars = length(regexp_replace(trim(text), "\\s+", "")).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*"))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      trim(l).endsWith("..."))).cast("long")
    // non-regex replace on both engines: identical left-to-right
    // non-overlapping scan, so the occurrence counts replay exactly
    val hashEllipsis =
      TextFunctions.charClassCount(text, "#").cast("long") +
        (length(text) - length(call_function("replace", text, lit("...")))) / 3L
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopArr = array(stopWords.map(lit): _*)
    val distinctStops = size(array_intersect(
      array_distinct(TextFunctions.tokens(lower(text))), stopArr)).cast("long")

    docs.select((col(idCol) +: carry.map(col)) ++ Seq(
      (nWords >= minWords && nWords <= maxWords).as("ok_word_count"),
      // 3 ≤ chars/words ≤ 10, integers: 3·words ≤ chars ≤ 10·words
      (nChars >= nWords * 3L && nChars <= nWords * 10L).as("ok_mean_word_len"),
      (hashEllipsis * 10L <= nWords).as("ok_symbol_ratio"),
      (bulletLines * 10L <= nLines * 9L).as("ok_bullet_lines"),
      (ellipsisLines * 10L <= nLines * 3L).as("ok_ellipsis_lines"),
      (alphaWords * 10L >= nWords * 8L).as("ok_alpha_words"),
      (distinctStops >= 2L).as("ok_stop_words")): _*)
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_bullet_lines") &&
          col("ok_ellipsis_lines") && col("ok_alpha_words") &&
          col("ok_stop_words"))
  }
}
