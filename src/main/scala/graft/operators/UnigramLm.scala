package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
  * model) in its deterministic hard-EM form — the subword sibling of
  * [[BpeTrainer]]: where BPE greedily merges pairs, the unigram model
  * keeps a piece vocabulary with log-probabilities and segments every
  * word by VITERBI (best-scoring split), then re-estimates piece
  * probabilities from the Viterbi counts. Hard EM (Viterbi counts, not
  * forward-backward expectations) for the [[Preference]] Dawid–Skene
  * reason: soft posteriors are float products no cross-engine gate can
  * pin, while the Viterbi argmax under integer e6 log-probs with a
  * total-order tie-break replays bit-exactly in SQL.
  *
  * Determinism ledger:
  *  - seed vocabulary = top `vocabSize` substrings (≤ pieceMaxLen) by
  *    (weighted count DESC, piece ASC) ∪ every single character —
  *    char coverage guarantees every word stays segmentable;
  *  - log-probs are the ONE pinned double pipeline
  *    round(ln(cnt/total)·1e6) on exact integer counts (Laplace +1 at
  *    every M-step so no piece hits −∞);
  *  - Viterbi DP maximizes the integer score sum; ties break toward
  *    the LONGER piece (smaller split point), which with fixed (start,
  *    end) determines the piece uniquely — a total order.
  *
  * Scale shape: the corpus collapses ONCE to distinct-word grain
  * (wordCounts' shuffle — the only pass over raw text); the substring
  * seed and the edge table are bounded explodes of that frame
  * (≤ maxWordLen·pieceMaxLen rows per word) joined against a vocab
  * small enough to broadcast. The Viterbi DP runs per WORD as one
  * higher-order `aggregate` expression over the word's sorted edge
  * array ([[viterbiEmits]], r15) — ONE groupBy shuffle per EM
  * iteration instead of the pre-r15 position-synchronous chain of
  * `maxWordLen` join+checkpoint rounds. Words truncate to
  * `maxWordLen` chars — the documented cap that bounds the DP length.
  *
  * Output: (piece, n_viterbi, logp_e6) for the full vocabulary — the
  * final Viterbi count (0 for never-chosen pieces) and the final
  * e6 log-probability. */
object UnigramLm {

  /** (word, cnt) at distinct-word grain under the shared normalization
    * (lowercase, [a-z]+ only, truncated to maxWordLen) — train and
    * encode must tokenize identically, so both go through here. */
  def wordFrame(docs: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    BpeTrainer.wordCounts(docs, textCol)
      .select(lower(col("word")).as("word"), col("cnt"))
      .where(col("word").rlike("^[a-z]+$"))
      .select(substring(col("word"), 1, maxWordLen).as("word"), col("cnt"))
      .groupBy("word").agg(sum("cnt").as("cnt"))
      .truncate(true) // distinct-word grain; every stage reads it

  /** Segmentation edges (word, cnt, start, end, piece) for in-vocab
    * pieces — static across EM rounds, only the log-probs move. */
  private def edgeFrame(wc: DataFrame, vocabPieces: DataFrame,
      pieceMaxLen: Int): DataFrame =
    wc.select(col("word"), col("cnt"), explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1), s ->
           |  transform(sequence(1, least($pieceMaxLen, length(word) - s)),
           |    l -> named_struct('start', s, 'end', s + l,
           |      'piece', substring(word, s + 1, l)))))""".stripMargin))
        .as("sp"))
      .select(col("word"), col("cnt"), col("sp.start").as("start"),
        col("sp.end").as("end"), col("sp.piece").as("piece"))
      .join(vocabPieces.select("piece"), Seq("piece"))
      .truncate(true)

  /** One Viterbi pass: forward DP (longer-piece tie-break) +
    * backtrack, emitting one (word, cnt, piece) row per chosen piece
    * per word.
    *
    * r15 optimization round: the DP used to run position-synchronously
    * across the whole word frame — maxWordLen forward rounds plus
    * maxWordLen backtrack rounds, EACH a join + eager localCheckpoint
    * (32 jobs per pass; the q351/q352 wall was pure job-scheduling
    * floor, per the round-14 fixed-cost probe). A word's DP is local
    * to the word (≤ maxWordLen positions, ≤ maxWordLen·pieceMaxLen
    * in-vocab edges), so the pass now groups the scored edges per word
    * ONCE and runs the identical integer DP inside a higher-order
    * `aggregate` projection: same scores (ps + logp_e6 in BIGINT),
    * same max(struct(score, -start)) tie-break toward the longer
    * piece, same unreachable-position semantics (NULL score = the
    * missing best row; a word whose end position is unreachable emits
    * nothing). The order-independence of the reduce (max over a set
    * with a total tie-break; (start, end) pairs are unique per word)
    * makes the collect_list order irrelevant. ONE shuffle per pass
    * instead of 32 checkpointed jobs. */
  private def viterbiEmits(wc: DataFrame, e: DataFrame, v: DataFrame,
      maxWordLen: Int): DataFrame = {
    val ew = e.join(v, Seq("piece"))
    val perWord = ew.groupBy(col("word"), col("cnt"))
      .agg(collect_list(struct(col("start"), col("end"),
        col("logp_e6"))).as("es"))
    perWord
      // dp: element_at(dp, p+1) = best (score, bstart) at position p;
      // score NULL = unreachable (no forward row in the old shape)
      .withColumn("dp", expr(
        """aggregate(
          |  sequence(1, length(word)),
          |  array(named_struct('score', CAST(0 AS BIGINT), 'bstart', -1)),
          |  (acc, p) -> concat(acc, array(
          |    aggregate(
          |      filter(es, ed -> ed.end = p
          |        AND element_at(acc, ed.start + 1).score IS NOT NULL),
          |      named_struct('score', CAST(NULL AS BIGINT),
          |        'bstart', CAST(NULL AS INT)),
          |      (b, ed) -> IF(b.score IS NULL
          |          OR named_struct(
          |              's', element_at(acc, ed.start + 1).score + ed.logp_e6,
          |              'ns', -ed.start)
          |            > named_struct('s', b.score, 'ns', -b.bstart),
          |        named_struct(
          |          'score', element_at(acc, ed.start + 1).score + ed.logp_e6,
          |          'bstart', ed.start),
          |        b)))))""".stripMargin))
      .withColumn("splits", expr(
        """CASE WHEN element_at(dp, length(word) + 1).score IS NULL
          |THEN CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>)
          |ELSE aggregate(
          |  sequence(1, length(word)),
          |  named_struct('pos', length(word),
          |    'acc', CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>)),
          |  (st, x) -> IF(st.pos <= 0, st,
          |    named_struct('pos', element_at(dp, st.pos + 1).bstart,
          |      'acc', concat(st.acc, array(named_struct(
          |        's', element_at(dp, st.pos + 1).bstart, 'e', st.pos))))),
          |  st -> st.acc) END""".stripMargin))
      .select(col("word"), col("cnt"), explode(col("splits")).as("sp"))
      .select(col("word"), col("cnt"),
        expr("substring(word, sp.s + 1, sp.e - sp.s)").as("piece"))
  }

  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      pieceMaxLen: Int = 4, maxWordLen: Int = 8,
      emRounds: Int = 2): DataFrame = {
    require(vocabSize >= 1 && pieceMaxLen >= 1 && pieceMaxLen <= maxWordLen)
    require(maxWordLen <= 16, "DP rounds = maxWordLen; cap at 16")
    require(emRounds >= 1 && emRounds <= 4)
    val wc = wordFrame(docs, textCol, maxWordLen)
    // weighted counts of every substring up to pieceMaxLen
    val sub = wc.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(0, length(word) - 1), s ->
           |  transform(sequence(1, least($pieceMaxLen, length(word) - s)),
           |    l -> substring(word, s + 1, l))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum("cnt").as("scnt"))
      .truncate(true)
    val top = sub.orderBy(col("scnt").desc, col("piece").asc)
      .limit(vocabSize)
    val chars = sub.where(length(col("piece")) === 1)
    val vocab = top.unionByName(chars)
      .groupBy("piece").agg(max("scnt").as("scnt"))
      .truncate(true)
    def logProbs(counts: DataFrame, cntCol: String): DataFrame = {
      val tot = counts.agg(sum(col(cntCol)).as("__t"))
      counts.crossJoin(broadcast(tot))
        .select(col("piece"), expr(
          s"""CAST(round(ln(CAST($cntCol AS DOUBLE) / CAST(__t AS DOUBLE))
             | * 1000000.0) AS BIGINT)""".stripMargin).as("logp_e6"))
        .truncate(true)
    }
    val e = edgeFrame(wc, vocab, pieceMaxLen)
    var v = logProbs(vocab, "scnt")
    var counts: DataFrame = null
    for (_ <- 1 to emRounds) {
      val emits = viterbiEmits(wc, e, v, maxWordLen)
      counts = vocab.select("piece")
        .join(emits.groupBy("piece").agg(sum("cnt").as("ecnt")),
          Seq("piece"), "left")
        .select(col("piece"),
          (coalesce(col("ecnt"), lit(0L)) + 1L).as("vcnt")) // Laplace
        .truncate(true)
      v = logProbs(counts, "vcnt")
    }
    counts.join(v, Seq("piece"))
      .select(col("piece"), (col("vcnt") - 1L).as("n_viterbi"),
        col("logp_e6"))
  }

  /** ENCODE under a trained vocabulary: per normalized word, the
    * Viterbi piece count (tokens-per-word). `v` is a (piece, logp_e6)
    * frame — the train() output projected, or any caller-supplied
    * model. Same DP, same tie-breaks, same normalization as training.
    * Output: (word, n_pieces). */
  def wordPieceCounts(docs: DataFrame, textCol: String, v: DataFrame,
      pieceMaxLen: Int = 4, maxWordLen: Int = 8): DataFrame = {
    require(pieceMaxLen >= 1 && maxWordLen <= 16)
    val wc = wordFrame(docs, textCol, maxWordLen)
    val e = edgeFrame(wc, v, pieceMaxLen)
    viterbiEmits(wc, e, v.select(col("piece"), col("logp_e6")), maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("n_pieces"))
  }
}
