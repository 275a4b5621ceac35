package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise reference/candidate text-evaluation metrics — the summary/
  * generation acceptance numbers (and near-duplicate audit signals)
  * computed as exact count arithmetic over per-pair gram censuses:
  *
  *  - [[rougeE6]] — ROUGE-1/2 (Lin 2004): clipped n-gram overlap
  *    recall/precision/F1, with the exact identity
  *    F1 = 2·o/(ref_total + cand_total) (the harmonic mean of o/r and
  *    o/c) so every number is ONE truncating integer division;
  *  - [[bleu2E6]] — sentence BLEU-2 (Papineni et al. 2002): clipped
  *    modified precisions p₁, p₂ as exact integer pairs, then the
  *    geometric mean and brevity penalty as ONE pinned double chain
  *    round(BP·√(p₁p₂)·1e6), BP = exp(1 − r/c) for c < r else 1;
  *  - [[editDistancePairs]] — Levenshtein distance on length-capped
  *    prefixes (both engines ship the classic DP built-in; the cap
  *    bounds the O(len²) per-row cost), normalized by the longer
  *    capped length.
  *
  * Tokenization is the house convention (lowercase, whitespace split —
  * [[CorpusOps.wordNgramsRaw]] verbatim). All three take a PAIR frame
  * (key columns + reference text + candidate text) and return it with
  * metric columns — pair-grain in, pair-grain out; the gram explodes
  * and overlap joins shuffle gram rows, never pairs². */
object TextEval {

  private def grams(df: DataFrame, keyCols: Seq[String], text: Column,
      n: Int, side: String): DataFrame = {
    val toks = df.select(keyCols.map(col) :+
      split(trim(lower(text)), "\\s+").as("__ts"): _*)
    val g =
      if (n == 1) toks.select(keyCols.map(col) :+
        explode(col("__ts")).as("g"): _*)
      else toks.select(keyCols.map(col) :+
        explode(when(size(col("__ts")) >= n,
            transform(sequence(lit(1), size(col("__ts")) - (n - 1)),
              i => array_join(slice(col("__ts"), i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as("g"): _*)
    g.groupBy(keyCols.map(col) :+ col("g"): _*)
      .agg(count(lit(1)).as(s"c_$side"))
  }

  /** Per-n sufficient statistics: (keys, o_n = Σ min(ref, cand) clipped
    * overlap, r_n = ref total, c_n = cand total). */
  private def overlapStats(df: DataFrame, keyCols: Seq[String],
      refText: Column, candText: Column, n: Int): DataFrame = {
    val r = grams(df, keyCols, refText, n, "r")
    val c = grams(df, keyCols, candText, n, "c")
    val o = r.join(c, keyCols :+ "g")
      .groupBy(keyCols.map(col): _*)
      .agg(sum(least(col("c_r"), col("c_c"))).as(s"o_$n"))
    val rt = r.groupBy(keyCols.map(col): _*)
      .agg(sum(col("c_r")).as(s"r_$n"))
    val ct = c.groupBy(keyCols.map(col): _*)
      .agg(sum(col("c_c")).as(s"c_$n"))
    // anchored on the pair frame itself so a gram-less side (doc
    // shorter than n tokens) zero-fills instead of dropping the pair
    df.select(keyCols.map(col): _*)
      .join(rt, keyCols, "left")
      .join(ct, keyCols, "left")
      .join(o, keyCols, "left")
      .select(keyCols.map(col) :+
        coalesce(col(s"o_$n"), lit(0L)).as(s"o_$n") :+
        coalesce(col(s"r_$n"), lit(0L)).as(s"r_$n") :+
        coalesce(col(s"c_$n"), lit(0L)).as(s"c_$n"): _*)
  }

  def rougeE6(df: DataFrame, keyCols: Seq[String], refText: Column,
      candText: Column): DataFrame = {
    val s1 = overlapStats(df, keyCols, refText, candText, 1)
    val s2 = overlapStats(df, keyCols, refText, candText, 2)
    def m(n: Int): Seq[Column] = Seq(
      when(col(s"r_$n") > 0L,
        expr(s"o_$n * 1000000 div r_$n")).otherwise(0L)
        .as(s"rouge${n}_recall_e6"),
      when(col(s"c_$n") > 0L,
        expr(s"o_$n * 1000000 div c_$n")).otherwise(0L)
        .as(s"rouge${n}_precision_e6"),
      when(col(s"r_$n") + col(s"c_$n") > 0L,
        expr(s"2 * o_$n * 1000000 div (r_$n + c_$n)")).otherwise(0L)
        .as(s"rouge${n}_f1_e6"))
    s1.join(s2, keyCols)
      .select(keyCols.map(col) ++ m(1) ++ m(2): _*)
  }

  def bleu2E6(df: DataFrame, keyCols: Seq[String], refText: Column,
      candText: Column): DataFrame = {
    val s1 = overlapStats(df, keyCols, refText, candText, 1)
    val s2 = overlapStats(df, keyCols, refText, candText, 2)
    s1.join(s2, keyCols)
      .select(keyCols.map(col) :+ col("o_1") :+ col("o_2") :+
        col("r_1").as("ref_len") :+ col("c_1").as("cand_len") :+
        expr(
          """CASE WHEN o_1 = 0 OR o_2 = 0 OR c_1 = 0 OR c_2 = 0 THEN 0
            | ELSE CAST(round(
            |  (CASE WHEN c_1 >= r_1 THEN 1.0
            |    ELSE exp(1.0 - CAST(r_1 AS DOUBLE)
            |      / CAST(c_1 AS DOUBLE)) END)
            |  * sqrt((CAST(o_1 AS DOUBLE) / CAST(c_1 AS DOUBLE))
            |       * (CAST(o_2 AS DOUBLE) / CAST(c_2 AS DOUBLE)))
            |  * 1000000.0) AS BIGINT) END""".stripMargin)
          .as("bleu2_e6"): _*)
  }

  /** chrF with β = 2 (Popović 2015, "chrF: character n-gram F-score
    * for automatic MT evaluation") — the character-level member of the
    * pair-eval family, robust to tokenization and morphology where the
    * word-gram ROUGE/BLEU are not. Pinned conventions (documented, both
    * engines): lowercase, ALL whitespace stripped (the standard chrF
    * prep), char n-grams for n = 1..maxN, orders where a side has no
    * grams contribute 0 (not skipped), and every division truncates:
    *   chrP_n = o_n·1e6 div c_n,  chrR_n = o_n·1e6 div r_n
    *   chrP = (Σ_n chrP_n) div maxN   (chrR likewise)
    *   chrF2 = 5·chrP·chrR div (4·chrP + chrR)   (β² = 4; 0 when both 0)
    * 5·P·R ≤ 5e12 — far inside LONG.
    *
    * Scale shape: ONE explode per side emits (n, gram) rows for ALL
    * orders (no per-order passes), one census aggregate per side, one
    * clipped-overlap join on (keys, n, gram) + per-(pair, n) totals —
    * gram rows shuffle, never pairs². Anchored on the pair × order grid
    * so gram-less sides zero-fill. ASCII-safe length semantics (Spark
    * counts UTF-16 units, DuckDB characters — identical on ASCII). */
  def chrFE6(df: DataFrame, keyCols: Seq[String], refText: Column,
      candText: Column, maxN: Int = 6): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"chrF: 1 ≤ maxN ≤ 10, got $maxN")
    def prep(t: Column): Column = regexp_replace(lower(t), "\\s+", "")
    def grams(text: Column, side: String): DataFrame = {
      val txt = prep(text)
      val all = flatten(transform(sequence(lit(1), lit(maxN)), n =>
        when(length(txt) >= n,
          transform(sequence(lit(1), length(txt) - n + lit(1)),
            i => struct(n.as("n"), txt.substr(i, n).as("g"))))
          .otherwise(array().cast("array<struct<n:int,g:string>>"))))
      df.select(keyCols.map(col) :+ explode(all).as("gn"): _*)
        .select(keyCols.map(col) :+ col("gn.n").as("n") :+
          col("gn.g").as("g"): _*)
        .groupBy(keyCols.map(col) :+ col("n") :+ col("g"): _*)
        .agg(count(lit(1)).as(s"c_$side"))
    }
    val r = grams(refText, "r")
    val c = grams(candText, "c")
    val nk = keyCols :+ "n"
    val o = r.join(c, nk :+ "g")
      .groupBy(nk.map(col): _*)
      .agg(sum(least(col("c_r"), col("c_c"))).as("o"))
    val rt = r.groupBy(nk.map(col): _*).agg(sum(col("c_r")).as("rr"))
    val ct = c.groupBy(nk.map(col): _*).agg(sum(col("c_c")).as("cc"))
    val grid = df.select(keyCols.map(col): _*)
      .withColumn("n", explode(sequence(lit(1), lit(maxN))))
    val st = grid
      .join(rt, nk, "left").join(ct, nk, "left").join(o, nk, "left")
      .select(keyCols.map(col) :+
        coalesce(col("o"), lit(0L)).as("o") :+
        coalesce(col("rr"), lit(0L)).as("rr") :+
        coalesce(col("cc"), lit(0L)).as("cc"): _*)
      .select(keyCols.map(col) :+
        when(col("cc") > 0L, expr("o * 1000000 div cc"))
          .otherwise(0L).as("p_n") :+
        when(col("rr") > 0L, expr("o * 1000000 div rr"))
          .otherwise(0L).as("r_n"): _*)
    st.groupBy(keyCols.map(col): _*)
      .agg(sum(col("p_n")).as("__sp"), sum(col("r_n")).as("__sr"))
      .withColumn("chrp_e6", expr(s"__sp div $maxN"))
      .withColumn("chrr_e6", expr(s"__sr div $maxN"))
      .withColumn("chrf2_e6",
        when(col("chrp_e6") * 4L + col("chrr_e6") > 0L,
          expr("(5 * chrp_e6 * chrr_e6) div (4 * chrp_e6 + chrr_e6)"))
          .otherwise(0L))
      .select(keyCols.map(col) :+ col("chrp_e6") :+ col("chrr_e6") :+
        col("chrf2_e6"): _*)
  }

  /** Levenshtein on `capChars`-capped prefixes + the max-length
    * normalized distance (e6). The cap is the documented per-row cost
    * bound — edit distance is O(len²) and belongs on prefixes or
    * short fields, never whole documents. */
  def editDistancePairs(df: DataFrame, keyCols: Seq[String],
      aText: Column, bText: Column, capChars: Int): DataFrame = {
    require(capChars >= 1 && capChars <= 1000,
      s"editDistancePairs: 1 ≤ capChars ≤ 1000, got $capChars")
    df.select(keyCols.map(col) :+
        substring(aText, 1, capChars).as("__a") :+
        substring(bText, 1, capChars).as("__b"): _*)
      .withColumn("len_a", length(col("__a")).cast("long"))
      .withColumn("len_b", length(col("__b")).cast("long"))
      .withColumn("dist", levenshtein(col("__a"), col("__b")).cast("long"))
      .withColumn("norm_e6", when(greatest(col("len_a"), col("len_b")) > 0L,
        expr("dist * 1000000 div greatest(len_a, len_b)")).otherwise(0L))
      .drop("__a", "__b")
  }
}
