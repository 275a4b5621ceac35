package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{ContentMetrics, Windows}
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators._
import graft.schema.{DeliveryLogLite, JoinSideEvent, ScopedEvent}
import graft.streaming.{CombineDeliveryLog, InferredJoin}
import GateSupport._
import CatalogDefs._

/** Subword tokenizers: bpe train/encode, unigram-lm train/encode, fertility, n-gram lms.
  *
  * 7 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object TokenizerGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Text analysis: BPE tokenizer TRAINING (Sennrich et al. 2016) — learn
    // 8 merges from the corpus word-frequency table (deterministic ties),
    // then count each doc's post-BPE tokens. The oracle unrolls all 8
    // iterations in SQL — pair counts, argmax pick, greedy fold — so the
    // whole training loop is hash-gated, not just the application.
    "q60_bpe_train" -> ((s, dir) =>
      operators.BpeTrainer.bpeTokenCounts(
        t(s, dir, "documents"), "doc_id", "text", k = 8)),

    // Tokenizer apply: full-document BPE ENCODE under the fixed merge
    // list below (trained once at build time — the q52 codebook pattern;
    // q60 gates training itself). Folds run once per distinct word; docs
    // reassemble in word order.
    "q78_bpe_encode" -> ((s, dir) =>
      operators.BpeTrainer.encode(t(s, dir, "documents"), "doc_id", "text",
        q78Merges)),

    // CCNet-style bigram-LM perplexity filter: fit an add-one-smoothed
    // bigram LM on the trusted (English) slice, score EVERY document by
    // average per-pair negative log-likelihood in integer micro-nats.
    "q100_bigram_lm" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.NgramLm.perplexityScore(docs.where(col("lang") === "en"),
        docs, "doc_id", "text")
    }),

    // Interpolated Kneser–Ney bigram table (top 25 bigrams by count):
    // absolute discount D=0.75 + continuation-count backoff, exact e6
    // integers — the smoothing a count-based LM ships instead of
    // q100's add-one.
    "q384_kneser_ney" -> ((s, dir) =>
      operators.NgramLm.kneserNeyTopE6(t(s, dir, "documents"),
        "doc_id", "text", discountE6 = 750000L, topK = 25)),

    // Tokenizer fertility audit per source under the fixed q78 BPE
    // merge list: tokens-per-word and chars-per-token in truncating e6
    // — the data-card row that flags a source the vocab encodes poorly
    // (high fertility = words shattering to near-characters).
    "q427_bpe_fertility" -> ((s, dir) =>
      operators.BpeTrainer.fertilityByGroup(t(s, dir, "documents"),
        "text", "source", q78Merges)
        .withColumnRenamed("group", "source")),

    // Unigram-LM tokenizer training (SentencePiece's model, hard-EM
    // Viterbi form) — BPE's sibling: seed substring vocabulary with
    // char coverage, two Viterbi-count EM rounds under pinned-ln e6
    // log-probs, longer-piece tie-breaks. The oracle unrolls the whole
    // thing: 8 forward DP positions + 8 backtrack steps per round.
    "q351_unigram_lm" -> ((s, dir) =>
      operators.UnigramLm.train(t(s, dir, "documents"), "text",
        vocabSize = 60, pieceMaxLen = 4, maxWordLen = 8, emRounds = 2)),

    // Unigram-LM ENCODE: train one EM round, then Viterbi-segment every
    // document word under the learned log-probs — per-source token
    // accounting (the tokens-per-word budget every data-mixture plan
    // needs, under the real tokenizer rather than a whitespace proxy).
    "q352_unigram_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val v = operators.UnigramLm.train(d, "text", vocabSize = 60,
          pieceMaxLen = 4, maxWordLen = 8, emRounds = 1)
        .select(col("piece"), col("logp_e6"))
      val wpc = operators.UnigramLm.wordPieceCounts(d, "text", v,
        pieceMaxLen = 4, maxWordLen = 8)
      d.select(col("source"), col("doc_id"),
          explode(split(trim(col("text")), "[ \t\n\f\r]+")).as("w0"))
        .select(col("source"), col("doc_id"), lower(col("w0")).as("w1"))
        .where(col("w1").rlike("^[a-z]+$"))
        .select(col("source"), col("doc_id"),
          substring(col("w1"), 1, 8).as("word"))
        .join(wpc, Seq("word"))
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_words"),
          sum(col("n_pieces")).as("n_tokens"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    "q60_bpe_train" -> q60OracleSql,

    // Full model replay: the bigram/context/vocab counts of the English
    // slice, then every document's pair stream scored through the same
    // pinned ln pipeline (integer micro-nats before the sum — q72 rule).
    "q100_bigram_lm" ->
      """WITH tb AS (SELECT doc_id, lang,
        |  list_prepend('<s>', regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        | FROM documents),
        |pr AS (SELECT doc_id, lang, toks, unnest(range(2, len(toks) + 1)) AS i FROM tb),
        |p AS (SELECT doc_id, lang, toks[i-1] AS prev, toks[i] AS cur FROM pr),
        |cb AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb FROM p
        | WHERE lang = 'en' GROUP BY 1, 2),
        |cu AS (SELECT prev, CAST(count(*) AS BIGINT) AS cu FROM p
        | WHERE lang = 'en' GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT cur) + 1 AS BIGINT) AS v FROM p
        | WHERE lang = 'en'),
        |c AS (SELECT doc_id,
        |  CAST(round(ln(CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE)
        |    / CAST(coalesce(cu.cu, 0) + v.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
        | FROM p LEFT JOIN cb USING (prev, cur) LEFT JOIN cu USING (prev) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST((-sum(lp)) // count(*) AS BIGINT) AS avg_nll_micro
        |FROM c GROUP BY 1""".stripMargin,

    "q78_bpe_encode" -> q78OracleSql,

    "q351_unigram_lm" -> q351OracleSql,

    // q384: the q100 tokenization verbatim, then the interpolated
    // Kneser–Ney components in the pinned truncation order.
    "q384_kneser_ney" ->
      """WITH tb AS (SELECT doc_id, list_prepend('<s>',
        |   regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
        | FROM documents),
        |pr AS (SELECT doc_id, toks, unnest(range(2, len(toks) + 1)) AS i
        | FROM tb),
        |p AS (SELECT toks[i-1] AS prev, toks[i] AS cur FROM pr),
        |cb AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
        | FROM p GROUP BY 1, 2),
        |cu AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cu,
        |  CAST(count(*) AS BIGINT) AS n1p_right FROM cb GROUP BY 1),
        |cl AS (SELECT cur, CAST(count(*) AS BIGINT) AS n1p_left
        | FROM cb GROUP BY 1),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM cb),
        |j AS (SELECT prev, cur, cb, cu, n1p_right, n1p_left,
        |  CAST(greatest(cb * 1000000 - 750000, 0) // cu AS BIGINT)
        |   AS term1_e6,
        |  CAST(750000 * n1p_right // cu AS BIGINT) AS lam_e6,
        |  CAST(n1p_left * 1000000 // b AS BIGINT) AS pcont_e6
        | FROM cb JOIN cu USING (prev) JOIN cl USING (cur)
        | CROSS JOIN b)
        |SELECT prev, cur, cb, cu, n1p_right, n1p_left, term1_e6,
        | lam_e6, pcont_e6,
        | CAST(term1_e6 + lam_e6 * pcont_e6 // 1000000 AS BIGINT)
        |  AS pkn_e6
        |FROM j ORDER BY cb DESC, prev, cur LIMIT 25""".stripMargin,

    "q427_bpe_fertility" -> q427OracleSql,

    "q352_unigram_encode" -> q352OracleSql,
  )
}
