package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Vocabulary-richness and unseen-mass estimation — the "how much of
  * this corpus' vocabulary have we actually seen" readout that sits
  * next to Heaps-law growth (q237) and OOV auditing (q375) in a
  * training-data pipeline: is another crawl round going to surface new
  * types, and how much probability mass do unseen types carry?
  *
  * Per group the sufficient statistics are the frequency-of-frequencies
  * profile: N (tokens), D (observed types), F1 (hapax types), F2
  * (dis legomena). From those, in exact integers:
  *
  *  - `chao1_e6` — the bias-corrected Chao1 lower bound on true
  *    richness (Chao 1984; Colwell 2012 bias-corrected form, defined
  *    even when F2 = 0):
  *      D·1e6 + (F1·(F1−1)·1e6) div (2·(F2+1))
  *  - `gt_unseen_ppm` — the Good–Turing missing-mass estimate (Good
  *    1953): probability the NEXT token is an unseen type, F1·1e6 div N
  *  - `coverage_ppm` — Turing sample coverage, 1e6 − gt_unseen_ppm.
  *
  * Products widen to DECIMAL(38,0) before multiplying and every
  * division is the truncating `div` (DuckDB `//` on HUGEINT), per the
  * house exactness convention.
  *
  * Scale shape: two map-side-combined hash aggregates — token grain →
  * (group, type) counts, then → (group, count) frequency-of-frequency
  * cells — and a per-group conditional sum over that census. Nothing
  * after the first aggregate is data-sized; the census is bounded by
  * the vocabulary, the profile by distinct frequencies.
  */
object Richness {

  /** `df` at token grain: one row per token occurrence with a group
    * column and a token column. One output row per group. */
  def richnessProfileE6(df: DataFrame, group: Column,
      token: Column): DataFrame = {
    val types = df.select(group.as("g"), token.as("w"))
      .groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("c"))
    types.groupBy(col("g"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("d_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("g"), col("n_tokens"), col("d_types"), col("f1"),
        col("f2"),
        expr("""CAST(d_types * 1000000 +
              | CAST(f1 AS DECIMAL(38,0)) * (f1 - 1) * 1000000
              |  div (2 * (f2 + 1)) AS BIGINT)""".stripMargin)
          .as("chao1_e6"),
        expr("f1 * 1000000 div n_tokens").as("gt_unseen_ppm"),
        expr("1000000 - f1 * 1000000 div n_tokens").as("coverage_ppm"))
  }

  /** Hill diversity profile (Hill 1973; Jost 2006's "effective number
    * of species" framing) — the three standard orders over a group's
    * token distribution, each an "effective vocabulary size":
    *
    *   ⁰D = D                    (richness — observed types)
    *   ¹D = exp(H), H = −Σ p ln p  (Shannon's effective types)
    *   ²D = 1/Σ p² = N² / Σ c²     (inverse Simpson — exact rational)
    *
    * The corpus-curation readout: how concentrated is a source's
    * vocabulary REALLY, at three sensitivities to rare types. ¹D is
    * the one pinned double chain of the house entropy convention —
    * per-type micro-nat terms round(−(c/N)·ln(c/N)·1e6) summed as
    * exact integers (shannon_e6), then hill1_e6 =
    * round(exp(shannon_e6/1e6)·1e6); ²D is a pure integer chain
    * N²·1e6 div Σc². Output per group: (g, n_tokens, hill0,
    * shannon_e6, hill1_e6, hill2_e6).
    *
    * Scale shape: the same two map-side-combined hash aggregates as
    * [[richnessProfileE6]]; nothing after the type census is
    * data-sized. */
  def hillProfileE6(df: DataFrame, group: Column,
      token: Column): DataFrame = {
    val types = df.select(group.as("g"), token.as("w"))
      .groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("c"))
    val tot = types.groupBy(col("g")).agg(sum(col("c")).as("n"))
    types.join(tot, "g")
      .select(col("g"), col("n"), col("c"),
        expr("""CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
              | * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
              | * 1000000.0) AS BIGINT)""".stripMargin).as("h_term"))
      .groupBy(col("g"), col("n"))
      .agg(count(lit(1)).as("hill0"),
        sum(col("h_term")).as("shannon_e6"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("__c2"))
      .select(col("g"), col("n").as("n_tokens"), col("hill0"),
        col("shannon_e6"),
        expr("""CAST(round(exp(CAST(shannon_e6 AS DOUBLE) / 1000000.0)
              | * 1000000.0) AS BIGINT)""".stripMargin).as("hill1_e6"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * n * 1000000 div __c2
              | AS BIGINT)""".stripMargin).as("hill2_e6"))
  }

  /** Simple Good–Turing count smoothing table (Good 1953; Gale &
    * Sampson 1995's presentation) for the low counts that matter:
    * per group and observed count r ≤ `maxR`, the frequency of
    * frequencies N_r and the Turing-smoothed count
    *
    *   r*·1e6 = (r+1)·N_{r+1}·1e6 div N_r
    *
    * (0 when N_{r+1} = 0 — the raw estimator, no tail fit; the
    * LM-smoothing consumer switches to a Zipf fit past the reliable
    * low-r region, q379's slope). The companion table to
    * [[richnessProfileE6]]'s scalar unseen mass. Output per (group,
    * r): (g, r, n_r, r_star_e6).
    *
    * Scale shape: type census → frequency-of-frequencies census
    * (both map-side-combined hash aggregates), then a self-join on
    * (g, r+1) over the ≤ maxR-row-per-group spectrum. */
  def goodTuringSmoothingE6(df: DataFrame, group: Column, token: Column,
      maxR: Int): DataFrame = {
    require(maxR >= 1 && maxR <= 1000,
      s"goodTuringSmoothingE6: 1 ≤ maxR ≤ 1000, got $maxR")
    val spectrum = df.select(group.as("g"), token.as("w"))
      .groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("r"))
      .groupBy(col("g"), col("r"))
      .agg(count(lit(1)).as("n_r"))
      .where(col("r") <= maxR + 1)
      .truncate(true) // both sides of the r+1 self-join read it
    spectrum.where(col("r") <= maxR)
      .join(spectrum.select(col("g"), (col("r") - 1).as("r"),
        col("n_r").as("n_r1")), Seq("g", "r"), "left")
      .select(col("g"), col("r"), col("n_r"),
        expr("""CAST(CAST(r + 1 AS DECIMAL(38,0))
              | * coalesce(n_r1, 0) * 1000000 div n_r
              | AS BIGINT)""".stripMargin).as("r_star_e6"))
  }

  /** Chapman capture–recapture estimator (Chapman 1951; the
    * bias-corrected Lincoln–Petersen): estimate a POPULATION size from
    * two overlapping samples —
    *
    *   N̂·1e6 = (n₁+1)·(n₂+1)·1e6 div (m+1) − 1e6
    *
    * with n₁, n₂ the distinct items captured by each sample and m the
    * items captured by both. The pipeline use: estimate catalog /
    * crawl-frontier size from two partial snapshots before paying for
    * the full scan (the companion to [[richnessProfileE6]]'s
    * vocabulary bound). Defined for m ≥ 0 (the +1s are the point of
    * Chapman's correction).
    *
    * Input: two item-key frames (any duplicates collapse). Output one
    * row: n1, n2, m, chapman_e6. If `truthDf` is provided (a one-row
    * frame with the exact population count, for audit gates), adds
    * truth and err_ppm = |N̂ − truth·1e6|·1e6 div (truth·1e6).
    *
    * Scale shape: two distinct-aggregates and an inner join on the
    * item key (all map-side-combinable), three one-row counts. */
  def chapmanE6(sample1: DataFrame, sample2: DataFrame,
      truthDf: Option[DataFrame] = None): DataFrame = {
    val a = sample1.toDF("k").distinct()
    val b = sample2.toDF("k").distinct()
    val n1 = a.agg(count(lit(1)).as("n1"))
    val n2 = b.agg(count(lit(1)).as("n2"))
    val m = a.join(b, Seq("k")).agg(count(lit(1)).as("m"))
    val base = n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
      .select(col("n1"), col("n2"), col("m"),
        expr("""CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1) * 1000000
              |div (m + 1) - 1000000 AS BIGINT)""".stripMargin)
          .as("chapman_e6"))
    truthDf match {
      case None => base
      case Some(t) =>
        base.crossJoin(broadcast(t.toDF("truth")))
          .withColumn("err_ppm", expr(
            """CAST(CAST(abs(chapman_e6 - truth * 1000000) AS DECIMAL(38,0))
              | * 1000000 div (truth * 1000000) AS BIGINT)""".stripMargin))
    }
  }
}
