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
}
