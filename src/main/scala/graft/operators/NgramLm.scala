package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet quality-filtering
  * shape (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", LREC 2020): fit a small LM on a trusted
  * slice (Wikipedia there, a language-filtered slice here), score the whole
  * crawl by per-token negative log-likelihood, and keep the low-perplexity
  * tail. The reference pipeline has no LM stage (its text ops stop at
  * validation/counting); this is a training-data extension per the
  * BASELINE.json north star.
  *
  * Model: add-one-smoothed bigram with a BOS sentinel —
  * P(w|p) = (c(p,w) + 1) / (c(p) + V), V = |train vocab| + 1 (the OOV
  * slot). Unseen contexts degrade to the uniform 1/V floor, so every
  * document scores without special cases.
  *
  * Scale shape: ONE tokenize pass per side. The model frames (bigram and
  * context counts) are aggregates of the TRAIN slice only — small by
  * construction (a trusted slice is curated, not crawl-sized) — and join
  * back to the scoring stream on token keys, where AQE broadcasts them
  * when they fit and shuffle-joins otherwise; the per-document rollup is
  * the only full-stream exchange. Hot contexts (stop words) are bounded by
  * vocabulary, not document count, so the model-side keys cannot skew.
  *
  * Exactness discipline (the q72/BM25 rule): each pair's log-probability
  * is ONE pinned double pipeline — integer counts in, one division, one
  * `ln` — rounded to integer micro-nats; per-document totals are LONG
  * sums of those, associative and partition-order independent, and the
  * average is a truncating integer division.
  */
object NgramLm {

  private val Bos = "<s>"

  /** (id, prev, cur) token-pair stream with a BOS sentinel per document. */
  private def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        concat(array(lit(Bos)),
          split(trim(lower(col(textCol))), "\\s+")).as("toks"))
      .select(col("id"),
        explode(transform(sequence(lit(2), size(col("toks"))),
          i => struct(element_at(col("toks"), i - 1).as("prev"),
            element_at(col("toks"), i).as("cur")))).as("p"))
      .select(col("id"), col("p.prev").as("prev"), col("p.cur").as("cur"))

  /** Score every document in `docs` under a bigram LM fit on `train`.
    * Output: (idCol, n_pairs, avg_nll_micro) — average per-pair negative
    * log-likelihood in integer micro-nats (lower = more fluent under the
    * training slice; CCNet keeps the bottom tail). */
  def perplexityScore(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tp = pairs(train, idCol, textCol)
    val cb = tp.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
    val cu = tp.groupBy(col("prev")).agg(count(lit(1)).as("cu"))
    val v = tp.agg((countDistinct(col("cur")) + lit(1)).as("v"))

    // Pinned double pipeline, mirrored literally in the q100 oracle:
    //   lp_micro = round(ln((cb + 1) / (cu + V)) · 1e6)
    val lp = round(log(
      (coalesce(col("cb"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("cu"), lit(0L)) + col("v")).cast("double")) *
      lit(1000000.0)).cast("long")

    pairs(docs, idCol, textCol)
      .join(cb, Seq("prev", "cur"), "left")
      .join(cu, Seq("prev"), "left")
      .crossJoin(v)
      .select(col("id"), lp.as("lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("lp")).as("sum_lp"))
      .select(col("id").as(idCol), col("n_pairs"),
        expr("(-sum_lp) div n_pairs").as("avg_nll_micro"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1998 interpolated form) — the smoothing every
    * serious count-based LM ships instead of add-one: absolute
    * discount on the bigram term plus a CONTINUATION-count unigram
    * backoff ("how many distinct contexts does w complete" rather than
    * "how often does w occur" — the San-Francisco/Francisco fix).
    *
    * With discount D (e6 scale), context count c(p) = Σ_w c(p,w),
    * right fan-out N₁₊(p·) = |{w : c(p,w) > 0}|, left fan-in
    * N₁₊(·w) = |{p : c(p,w) > 0}|, and B = total distinct bigram
    * types:
    *
    *   term1_e6 = max(c(p,w)·1e6 − D_e6, 0) div c(p)
    *   lam_e6   = D_e6 · N₁₊(p·) div c(p)
    *   pcont_e6 = N₁₊(·w)·1e6 div B
    *   pkn_e6   = term1_e6 + lam_e6 · pcont_e6 div 1e6
    *
    * All LONG with truncating `div` in the pinned order above (the
    * per-term-truncation convention; c·1e6 fits LONG under the
    * documented N·1e6 contract, lam·pcont ≤ 1e12). λ is exactly the
    * mass the discount removed, so Σ_w pkn(w|p) ≈ 1 up to truncation —
    * the spec checks that identity on a hand corpus.
    *
    * Output: the `topK` bigrams by (count DESC, prev, cur) — a unique
    * total order — with all components. Scale shape: one tokenize
    * pass → bigram hash aggregate; fan-outs/fan-ins are aggregates of
    * the bigram-TYPE frame (vocabulary-bounded, not corpus-bounded);
    * the top-k is a TakeOrderedAndProject, never a global sort. */
  def kneserNeyTopE6(docs: DataFrame, idCol: String, textCol: String,
      discountE6: Long = 750000L, topK: Int = 25): DataFrame = {
    require(discountE6 >= 0L && discountE6 <= 1000000L,
      s"NgramLm.kneserNeyTopE6: discount must be in [0, 1e6], got $discountE6")
    val cb = pairs(docs, idCol, textCol)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
    val cu = cb.groupBy(col("prev"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("n1p_right"))
    val cl = cb.groupBy(col("cur")).agg(count(lit(1)).as("n1p_left"))
    val b = cb.agg(count(lit(1)).as("b"))
    cb.join(cu, Seq("prev"))
      .join(cl, Seq("cur"))
      .crossJoin(broadcast(b))
      .select(col("prev"), col("cur"), col("cb"), col("cu"),
        col("n1p_right"), col("n1p_left"),
        expr(s"greatest(cb * 1000000 - $discountE6, 0) div cu")
          .as("term1_e6"),
        expr(s"$discountE6 * n1p_right div cu").as("lam_e6"),
        expr("n1p_left * 1000000 div b").as("pcont_e6"))
      .withColumn("pkn_e6",
        expr("term1_e6 + lam_e6 * pcont_e6 div 1000000"))
      .orderBy(col("cb").desc, col("prev"), col("cur"))
      .limit(topK)
  }
}
