package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Luhn extractive summarization, simplified (Luhn 1958, "The
  * automatic creation of literature abstracts") — pick each document's
  * most information-dense sentence: SIGNIFICANT words are the
  * mid-band of the corpus frequency spectrum (too rare = noise, too
  * frequent = stopwords — Luhn's original band-pass intuition, with
  * the band as explicit integer parameters instead of a stopword
  * list), and a sentence scores by significant-word density,
  *
  *   score_e6 = nsig² · 1e6 div nwords
  *
  * (simplified from Luhn's within-sentence word-cluster window to
  * whole-sentence density — documented; the ranking behavior on short
  * web sentences is equivalent and the arithmetic is exactly
  * replayable). Best sentence per doc by (score DESC, sentence index
  * ASC) via ONE struct-min aggregate — no window function.
  *
  * The summarization step of a data-curation pipeline: the extracted
  * sentence is the document's cheap self-summary for dedup keys,
  * preview fields, or weak labels.
  *
  * Scale shape: one corpus pass to the word census (the significance
  * set — vocabulary-bounded, broadcast), one sentence-explode pass
  * scoring each sentence against the broadcast set, one doc-grain
  * struct-min aggregate. Sentences with no words are skipped; docs
  * with no scorable sentence don't appear.
  *
  * Output: (idCol, best_sidx, nsig, nwords, score_e6). */
object Summarize {

  def luhnBest(docs: DataFrame, idCol: String, textCol: String,
      minFreq: Long, maxFreq: Long): DataFrame = {
    require(minFreq >= 1L && maxFreq >= minFreq,
      s"Summarize.luhnBest: need 1 ≤ minFreq ≤ maxFreq")
    val words = docs.select(
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val sig = words.where(col("f") >= minFreq && col("f") <= maxFreq)
      .select(col("w"))
    val sent = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\\.")).as(Seq("sidx", "s")))
      .select(col("id"), col("sidx").cast("long").as("sidx"),
        explode(split(trim(lower(col("s"))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    val scored = sent
      .join(broadcast(sig.withColumn("__sig", lit(1L))), Seq("w"), "left")
      .groupBy(col("id"), col("sidx"))
      .agg(count(lit(1)).as("nwords"),
        sum(coalesce(col("__sig"), lit(0L))).as("nsig"))
      .withColumn("score_e6",
        expr("nsig * nsig * 1000000 div nwords"))
    scored.groupBy(col("id"))
      .agg(min(struct((-col("score_e6")).as("ns"), col("sidx"),
        col("nsig"), col("nwords"))).as("b"))
      .select(col("id").as(idCol), col("b.sidx").as("best_sidx"),
        col("b.nsig").as("nsig"), col("b.nwords").as("nwords"),
        (-col("b.ns")).as("score_e6"))
  }
}
