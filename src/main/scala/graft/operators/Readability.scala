package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability scoring — the classic prose-difficulty indices every
  * corpus data card reports, in exact integer arithmetic.
  *
  * Counting rules (pinned, mirrored in the oracle):
  *  - words: whitespace tokens of trim(lower(text)) with empties
  *    dropped (the house tokenizer, minus the ""-token artifact);
  *  - sentences: max(1, number of `[.!?]+` runs) — unpunctuated text
  *    counts as one sentence rather than dividing by zero;
  *  - syllables: per word, max(1, number of `[aeiouy]+` vowel groups)
  *    — the standard dictionary-free heuristic (every word carries at
  *    least one spoken syllable).
  *
  * Indices at e3 scale with truncating divisions (pinned order):
  *
  *   flesch_e3   = 206835 − 1015·W div S − 84600·Syl div W
  *   fk_grade_e3 = 390·W div S + 11800·Syl div W − 15590
  *
  * Shape: ONE scan — tokens are projected once per row and reduced
  * with codegen'd higher-order functions (no token-grain explode, no
  * shuffle below group grain), then a group-grain census carries the
  * formula. Products widen to DECIMAL(38,0) before the divisions, so
  * corpus-scale word counts cannot overflow. */
object Readability {

  def fleschKincaid(docs: DataFrame, textCol: Column,
      groupCols: Seq[String]): DataFrame = {
    val per = docs.select(groupCols.map(col) :+
        filter(split(trim(lower(textCol)), "\\s+"), w => w =!= "")
          .as("__t") :+
        greatest(lit(1),
          size(regexp_extract_all(textCol, lit("[.!?]+"), lit(0))))
          .cast("long").as("__sents"): _*)
      .select(groupCols.map(col) :+ col("__sents") :+
        size(col("__t")).cast("long").as("__words") :+
        coalesce(aggregate(col("__t"), lit(0L), (acc, w) =>
          acc + greatest(lit(1),
            size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))
            .cast("long")), lit(0L)).as("__syls"): _*)
    per.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__words")).as("words"),
        sum(col("__sents")).as("sentences"),
        sum(col("__syls")).as("syllables"))
      .withColumn("wps_e3", expr(
        "CAST(CAST(words AS DECIMAL(38,0)) * 1000 div sentences AS BIGINT)"))
      .withColumn("spw_e3", expr(
        """CASE WHEN words = 0 THEN NULL
          | ELSE CAST(CAST(syllables AS DECIMAL(38,0)) * 1000
          |   div words AS BIGINT) END""".stripMargin))
      .withColumn("flesch_e3", expr(
        """CASE WHEN words = 0 THEN NULL
          | ELSE CAST(206835
          |   - CAST(1015 AS DECIMAL(38,0)) * words div sentences
          |   - CAST(84600 AS DECIMAL(38,0)) * syllables div words
          |  AS BIGINT) END""".stripMargin))
      .withColumn("fk_grade_e3", expr(
        """CASE WHEN words = 0 THEN NULL
          | ELSE CAST(CAST(390 AS DECIMAL(38,0)) * words div sentences
          |   + CAST(11800 AS DECIMAL(38,0)) * syllables div words
          |   - 15590 AS BIGINT) END""".stripMargin))
  }
}
