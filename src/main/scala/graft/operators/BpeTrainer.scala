package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** BPE tokenizer training (Sennrich, Haddow, Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the algorithm every
  * modern LLM tokenizer derives from).
  *
  * Classic formulation: training operates on the WORD-FREQUENCY table, not
  * the corpus — one corpus-wide shuffle counts words, then every merge
  * iteration runs on the bounded vocabulary frame (distinct words ≪
  * corpus size; at 100 TB the vocab of whitespace words is millions of
  * rows while the corpus is trillions of tokens). Each iteration:
  *
  *  1. count adjacent symbol pairs weighted by word frequency (explode →
  *     partial-agg groupBy on the tiny vocab frame);
  *  2. pick the most frequent pair — ties to the lexicographically lowest
  *     (left, right), so training is deterministic; the pick is a 1-row
  *     collect per iteration (a bounded driver action, like the PQ
  *     codebook collect);
  *  3. apply the merge greedily left-to-right within every word (a merged
  *     symbol never re-merges in the same pass — standard BPE semantics),
  *     as a declarative `aggregate` fold, no UDF.
  *
  * Application to new text reuses the same fold: `applyMerges` rewrites a
  * symbol array through the learned merge list in rank order — a scalar
  * projection (broadcast-join the vocab or inline the merges), zero
  * shuffle beyond the word join.
  */
object BpeTrainer {

  /** A learned merge: 1-based rank, the two symbols joined, and the
    * weighted pair count at pick time. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Whitespace class == RE2's \s ([\t\n\f\r ]): Java's \s adds \x0B,
    * which a DuckDB (RE2) oracle would keep inside a word — the explicit
    * class keeps both engines' tokenizations identical. */
  private val Ws = "[ \t\n\f\r]+"

  /** (word, cnt) — the one corpus-wide shuffle. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), Ws)).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Splits a word column into its single-character symbol array. */
  def charSymbols(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))

  /** One greedy left-to-right merge pass of (left, right) over a symbol
    * array: fold symbols, merging when the accumulator's last symbol is
    * `left` and the incoming one is `right`. The merged symbol becomes the
    * new tail and cannot re-merge in this pass (left+right ≠ left). */
  def mergeOnce(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        try_element_at(acc, lit(-1)) === lit(left) && s === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(s))))

  /** Applies the learned merges in rank order. */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => mergeOnce(c, m.left, m.right))

  /** Trains `k` merges on a (word, cnt) frame.
    *
    * Each iteration ends in a `localCheckpoint`: without it, iteration i's
    * plan nests i merge folds and the optimizer re-analyzes (and the pair
    * count re-executes) the whole stack on every pick — O(k²) plan growth
    * that measured 45 s for k=8 on a 31-word vocab. Checkpointing caps
    * every iteration at one fold over materialized rows (measured ~2 s). */
  def trainMerges(wordCnt: DataFrame, k: Int): Seq[Merge] = {
    var vocab = wordCnt.select(col("word"), col("cnt"),
      charSymbols(col("word")).as("syms"))
      .truncate(true)
    val out = Seq.newBuilder[Merge]
    for (rank <- 1 to k) {
      // adjacent pairs weighted by word frequency
      val pairs = vocab
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val top = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .collect() // bounded driver action: ONE row per iteration
      if (top.isEmpty) return out.result() // vocab fully merged
      val m = Merge(rank, top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += m
      vocab = vocab.withColumn("syms", mergeOnce(col("syms"), m.left, m.right))
        .truncate(true)
    }
    out.result()
  }

  /** Full-document BPE ENCODE under a fixed merge list — the apply half
    * of the tokenizer loop ([[trainMerges]] learns the list; this is the
    * GPT-2-style "ship the merges file, encode any corpus" step, so the
    * merges are config, not necessarily trained on `docs`).
    *
    * Scale shape: the merge folds run once per DISTINCT word (the
    * bounded vocab frame), never per occurrence; occurrences take a
    * broadcast join and a per-doc ordered reassembly (the q53 shape).
    * Tokens of a word never contain whitespace, so the space-joined
    * `bpe_text` is an unambiguous serialization of the token sequence.
    *
    * Output: (idCol, n_bpe_tokens, bpe_text); documents whose text
    * whitespace-trims to nothing have no words and drop out. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty)
    val ms = merges.zipWithIndex.map { case ((l, r), i) => Merge(i + 1, l, r, 0L) }
    val words = docs
      .select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), Ws)).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
    val vocab = words.select(col("word")).distinct()
      .select(col("word"),
        applyMerges(charSymbols(col("word")), ms).as("toks"))
      .select(col("word"), size(col("toks")).cast("long").as("ntok"),
        array_join(col("toks"), " ").as("tokstr"))
    words.join(broadcast(vocab), "word")
      .groupBy(col("id"))
      .agg(sum(col("ntok")).as("n_bpe_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tokstr")))),
            e => e.getField("tokstr")), " ").as("bpe_text"))
      .select(col("id").as(idCol), col("n_bpe_tokens"), col("bpe_text"))
  }

  /** Per-document token counts under a learned BPE: train `k` merges on
    * the corpus, then sum each document's per-word symbol counts via a
    * broadcast join against the merged vocabulary. Output:
    * (idCol, n_bpe_tokens). */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    // ONE corpus scan: training and the vocab-size join both read this
    // frame (without the persist the corpus word count re-runs per
    // consumer — the q21 trap)
    val wc = wordCounts(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = trainMerges(wc, k)
    val vocabSizes = wc.select(col("word"),
      size(applyMerges(charSymbols(col("word")), merges)).cast("long").as("ntok"))
    docs.select(col(idCol), explode(split(trim(col(textCol)), Ws)).as("word"))
      .where(length(col("word")) > 0)
      .join(broadcast(vocabSizes), "word")
      .groupBy(col(idCol))
      .agg(sum(col("ntok")).as("n_bpe_tokens"))
  }

  /** Tokenizer fertility/compression audit per group under a FIXED
    * merge list: words, BPE tokens, chars, fertility = tokens per word
    * and chars per token in truncating e6 — the data-card row that
    * flags a source the learned vocab encodes poorly (fertility ≫ the
    * corpus norm means domain mismatch: its words shatter into
    * near-character pieces).
    *
    * Shape: per-word token counts are computed ONCE on the
    * distinct-word frame and broadcast back (the [[encode]] contract);
    * the group stats are one hash aggregate. No token-grain shuffle. */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty)
    val ms = merges.zipWithIndex.map { case ((l, r), i) =>
      Merge(i + 1, l, r, 0L) }
    val words = docs.select(col(groupCol).as("group"),
        explode(split(trim(col(textCol)), Ws)).as("word"))
      .where(length(col("word")) > 0)
    val vocab = words.select(col("word")).distinct()
      .select(col("word"),
        size(applyMerges(charSymbols(col("word")), ms)).cast("long")
          .as("ntok"),
        length(col("word")).cast("long").as("nchr"))
    words.join(broadcast(vocab), "word")
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"),
        sum(col("nchr")).as("n_chars"))
      .select(col("group"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        expr("""CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000
               | div n_words AS BIGINT)""".stripMargin).as("fertility_e6"),
        expr("""CAST(CAST(n_chars AS DECIMAL(38,0)) * 1000000
               | div n_tokens AS BIGINT)""".stripMargin)
          .as("chars_per_token_e6"))
  }
}

