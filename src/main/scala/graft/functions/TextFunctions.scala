package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale document pipelines:
  * tokenization, fingerprinting, quality signals, language-ID heuristic.
  *
  * All are pure `org.apache.spark.sql.functions` compositions (codegen'd,
  * no UDFs) so they vectorize and survive WholeStageCodegen at 100 TB scans.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (collapses runs of whitespace). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish pre-tokenization: letter runs, digit runs, and single other
    * non-space symbols — the usual byte-pair-encoder pre-split shape.
    * Kept to a regex subset that Java and RE2 engines treat identically. */
  val bpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeIshPattern), lit(0))

  def bpeIshTokenCount(text: Column): Column = size(bpeIshTokens(text))

  /** Canonical form for exact-dedup: lowercase, collapse whitespace, trim. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic document fingerprint (md5 of the normalized text).
    * Exact near-identical dedup = groupBy(fingerprint). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Count of characters matching a class (e.g. punctuation) — quality signal. */
  def charClassCount(text: Column, regexClass: String): Column =
    length(text) - length(regexp_replace(text, regexClass, ""))

  /** Number of tokens that appear in `words` (e.g. stopwords). */
  def wordHitCount(text: Column, words: Seq[String]): Column = {
    val wordArr = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(wordArr, t)))
  }

  /** Tiny per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Real deployments plug in fastText-style models via the same
    * column signature; this keeps language-ID deterministic and codegen'd. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
  )

  /** Language-ID heuristic: argmax of marker-lexicon hit counts; ties and
    * zero-hit texts fall back to "und" (undetermined). */
  def langIdHeuristic(text: Column): Column = {
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(wordHitCount(text, words).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Gopher-style repetition census (Rae et al. 2021, "Scaling Language
    * Models and Methods" §A1.1.3 — public filter set): per document, the
    * unit-level duplication counts behind the duplicate-line-fraction /
    * duplicate-line-character-fraction rules (unitRegex "\n") and their
    * duplicate-word/n-gram variants (unitRegex "\\s+"). Emitted as
    * INTEGER numerators/denominators — callers threshold
    * `n_dup_units/n_units` and `dup_unit_chars/total_unit_chars` in
    * integer arithmetic, so output is bit-stable across engines.
    *
    * Shape: explode non-blank units → per-(doc, unit) counts → per-doc
    * sums. Two partial-aggregated shuffles on the doc id, no UDFs;
    * repeated-unit payloads never leave their group. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, unitRegex: String = "\n"): org.apache.spark.sql.DataFrame = {
    val units = docs
      .select(col(idCol), explode(split(col(textCol), unitRegex)).as("__u"))
      .where(trim(col("__u")) =!= "")
    units
      .groupBy(col(idCol), col("__u"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__cnt")).as("n_units"),
        count(lit(1)).as("n_uniq_units"),
        sum(when(col("__cnt") > 1, col("__cnt")).otherwise(0L)).as("n_dup_units"),
        sum(when(col("__cnt") > 1, col("__cnt") * length(col("__u")))
          .otherwise(0L)).as("dup_unit_chars"),
        sum(col("__cnt") * length(col("__u"))).as("total_unit_chars"))
  }

  /** Integer quality score in [0,100]: penalizes very short docs, low token
    * diversity, and high punctuation density. Floor-division integer math so
    * the score is bit-identical across engines/partitionings. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val nUniq = distinctTokenCount(text)
    val nChar = length(text)
    val punct = charClassCount(text, "[\\p{Punct}]")
    val lengthScore = floor(least(nTok, lit(40)) * 25 / 40).cast("long") // 0..25
    val diversityScore =
      when(nTok > 0, floor(nUniq * 50 / nTok).cast("long")).otherwise(0L) // 0..50
    val punctPenalty = when(nChar > 0,
      least(floor(punct * 100 / nChar).cast("long"), lit(25L))).otherwise(0L)
    greatest(least(lengthScore + diversityScore + (lit(25L) - punctPenalty), lit(100L)), lit(0L))
  }
}
