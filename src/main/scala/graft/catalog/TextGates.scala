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

/** Text analysis + corpus prep: quality, lang-id, repetition, pii, packing, contamination, keywords, readability.
  *
  * 42 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object TextGates extends GateFamily {

  /** Shared consecutive-pair fixture for the q454/q455/q456 pairwise
    * text-eval gates: per source, doc rank 2k−1 is the reference and
    * rank 2k the candidate (the q355 pairing — deterministic under
    * the unique doc_id order). */
  private def q454Pairs(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val d = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .withColumn("rn", row_number().over(w))
    val ref = d.where(col("rn") % 2 === 1)
      .select(col("source"), expr("(rn + 1) div 2").as("pr"),
        col("text").as("ref_t"))
    val cand = d.where(col("rn") % 2 === 0)
      .select(col("source"), expr("rn div 2").as("pr"),
        col("text").as("cand_t"))
    ref.join(cand, Seq("source", "pr"))
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Text analysis: token/char/quality per document
    "q16_text_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.distinctTokenCount(col("text")).cast("long").as("n_uniq_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    }),

    // Text analysis: language-ID heuristic vs labeled lang
    "q17_lang_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("lang"),
          TextFunctions.langIdHeuristic(col("text")).as("detected"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
        .groupBy(col("lang"), col("detected"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
    }),

    // Text analysis: BPE-ish pre-tokenization counts
    "q28_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.bpeIshTokenCount(col("text")).cast("long").as("n_bpe"),
        size(TextFunctions.bpeIshTokens(lower(col("text")))).cast("long").as("n_bpe_lower"))),

    // Text analysis: Gopher-style repetition census (duplicate-unit and
    // duplicate-unit-character numerators/denominators, Rae et al. 2021
    // §A1.1.3) at word granularity — the dup-line rule's instantiation for
    // this corpus; thresholds divide these integers downstream
    "q40_repetition" -> ((s, dir) =>
      TextFunctions.repetitionStats(t(s, dir, "documents"), "doc_id", "text",
        "\\s+")),

    // ROUGE-1/2 (Lin 2004) over consecutive same-source doc pairs
    // (odd doc = reference, even = candidate — the q355 pairing):
    // clipped n-gram overlap recall/precision/F1, every number one
    // truncating integer division (F1 = 2o/(r+c) exactly) — the
    // summary-eval acceptance metric as a corpus-scale census.
    "q454_rouge" -> ((s, dir) =>
      operators.TextEval.rougeE6(q454Pairs(s, dir),
        Seq("source", "pr"), col("ref_t"), col("cand_t"))),

    // Sentence BLEU-2 (Papineni et al. 2002) on the same pairs:
    // exact clipped modified precisions, brevity penalty + geometric
    // mean as ONE pinned double chain.
    "q455_bleu2" -> ((s, dir) =>
      operators.TextEval.bleu2E6(q454Pairs(s, dir),
        Seq("source", "pr"), col("ref_t"), col("cand_t"))),

    // Levenshtein edit distance on 200-char prefixes of the same
    // pairs (the bounded-cost contract — edit distance is O(len²)),
    // max-length normalized: the character-level near-dup audit
    // beside the token-level q19/q21 miners.
    "q456_edit_distance" -> ((s, dir) =>
      operators.TextEval.editDistancePairs(q454Pairs(s, dir),
        Seq("source", "pr"), col("ref_t"), col("cand_t"),
        capChars = 200)),

    // chrF2 (Popović 2015) on the same pairs: char n-gram (n=1..6)
    // clipped precision/recall censuses + the β=2 F-score, every
    // division truncating e6 — the tokenization-robust character-level
    // member beside the word-gram ROUGE/BLEU (r15).
    "q459_chrf" -> ((s, dir) =>
      operators.TextEval.chrFE6(q454Pairs(s, dir),
        Seq("source", "pr"), col("ref_t"), col("cand_t"), maxN = 6)),

    // Distinct-n diversity profile (Li et al. 2016's distinct-1/-2 as
    // a corpus readout): per source and n ∈ {1,2,3}, total vs distinct
    // word n-grams (per-document grams — never spanning docs) and the
    // truncating distinct share — templated/repetitive sources score
    // low before they reach training; the corpus-grain complement to
    // q40's within-document repetition census.
    "q443_distinct_ngrams" -> ((s, dir) =>
      CorpusOps.distinctNgramProfileE6(t(s, dir, "documents"),
        "source", "text", maxN = 3)
        .withColumnRenamed("grp", "source")),

    // Corpus prep: deterministic hash split — stable under corpus growth,
    // engine- and partitioning-independent (no rand(), no global order)
    "q44_split_assign" -> ((s, dir) =>
      CorpusOps.splitAssign(t(s, dir, "documents").select(col("doc_id")),
        "doc_id", "#split#v1")),

    // Corpus prep: concat-and-chunk sequence packing per source shard —
    // the GPT-style pretraining layout; sharded windows keep it
    // distributed (no global-order single-partition window)
    "q45_pack_sequences" -> ((s, dir) =>
      CorpusOps.packSequences(t(s, dir, "documents"), "doc_id", "source",
        TextFunctions.tokenCount(col("text")), budgetTokens = 512L)),

    // Corpus prep: PII detect + redact. The synthetic corpus carries no
    // natural PII, so deterministic markers are injected from doc_id
    // residues first — the detect/redact path is then exercised on
    // genuinely varied positives AND true negatives in both engines
    "q46_pii_scrub" -> ((s, dir) => {
      val injected = concat(col("text"),
        when(col("doc_id") % 5 === 0, concat(lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, concat(lit(" see https://example.org/d/"),
          col("doc_id").cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" call +1 555 867 5309"))
          .otherwise(lit("")))
      CorpusOps.piiScrub(t(s, dir, "documents"), injected)
        .select(col("doc_id"), col("n_emails"), col("n_urls"),
          col("n_phones"), col("redacted"))
    }),

    // Corpus prep: train/test n-gram decontamination — training docs
    // sharing any word 3-gram with the held-out set (doc_id ≡ 0 mod 50);
    // the pipeline anti-joins this frame before tokenizing
    "q47_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      CorpusOps.contamination(
        d.where(col("doc_id") % 50 =!= 0),
        d.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3)
    }),

    // Corpus prep: mixture resampling — even-numbered sources kept at
    // ~80%, odd at ~20%, gated by a deterministic md5 bucket so the kept
    // set is stable across runs/engines/partitionings
    "q49_mixture_sample" -> ((s, dir) => {
      val even = (substring(col("source"), 4, 8).cast("int") % 2) === 0
      CorpusOps.mixtureSample(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "#mix#v1",
        when(even, lit(CorpusOps.pctHexBound(80)))
          .otherwise(lit(CorpusOps.pctHexBound(20))))
    }),

    // Corpus stats: exact discrete length quantiles per split via the
    // distinct-value histogram (window over |distinct values|, not |rows|)
    "q48_length_quantiles" -> ((s, dir) =>
      CorpusOps.discQuantiles(
        CorpusOps.splitAssign(t(s, dir, "documents"), "doc_id", "#split#v1")
          .select(col("split"),
            TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "split", "n_tokens", Seq(50, 90, 99))),

    // Text analysis: fastText-shaped quality classifier — hashed
    // bag-of-ngrams (uni+bigrams) linear scoring in ONE codegen pass over
    // the text bytes, zero shuffle. Procedurally-derived weights stand in
    // for a trained model (trained tables plug in via
    // hashedNgramScoreTable); every step is SQL-replayable, so the oracle
    // re-scores every doc from scratch.
    "q59_quality_classifier" -> ((s, dir) => {
      functions.HashedClassifier.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        functions.HashedClassifier.hashedNgramScore(
          col("text"), maskBits = 20, seed = 42L, bigrams = true).as("score"))
        .withColumn("accept", col("score") >= 0L)
    }),

    // Sliding-window chunking (embedding/RAG ingestion): 16-token windows
    // advancing by 8 (50% overlap) + the tail-aligned final window. Pure
    // narrow op — chunk key is the token start offset.
    "q99_chunk_overlap" -> ((s, dir) =>
      operators.CorpusOps.chunkTokens(t(s, dir, "documents"), "doc_id",
        "text", window = 16, stride = 8)),

    // Exact percentile-rank normalization (curriculum/mixture input):
    // per-doc quality percentile in ppm from a value census + one
    // cumulative window — no row sort.
    "q153_quality_percentile" -> ((s, dir) =>
      Profile.percentRankPpm(
        t(s, dir, "documents").select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("q")),
        "doc_id", col("q"))),

    // Quality-aware canonicalization: each near-dup cluster keeps its
    // HIGHEST-quality member (tie → smallest id) instead of the min-id —
    // the production keep rule (RefinedWeb keeps the best duplicate, not
    // an arbitrary one); one struct-argmax over the materialized
    // component map, no window sort.
    "q134_quality_canon" -> ((s, dir) => {
      val comp = minedDocComponents(s, dir).withColumnRenamed("node", "doc_id")
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
        .join(comp, Seq("doc_id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("component"),
          col("doc_id"), col("q"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("q"), (-col("doc_id")).as("neg_id"))).as("k"))
        .select(col("component"), col("n_members"),
          (-col("k.neg_id")).as("keeper_doc_id"),
          col("k.q").as("keeper_quality"))
    }),

    // Per-language corpus report card (the data-card table a corpus
    // release ships): docs, tokens, near-dup non-canonical count, summed
    // quality — three signal families joined on the doc key, grouped
    // once; all-integer cells.
    "q135_lang_report" -> ((s, dir) => {
      val comp = minedDocComponents(s, dir).withColumnRenamed("node", "doc_id")
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .join(comp, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          coalesce(sum(when(col("component").isNotNull &&
            col("component") =!= col("doc_id"), 1L).otherwise(0L)), lit(0L))
            .as("n_noncanonical"),
          sum(col("q")).as("sum_quality"))
    }),

    // Collocation mining by PMI (Church–Hanks): adjacent-pair census vs
    // unigram chance, min-count floor against the rare-pair magnet,
    // pinned three-ln micro-nat scoring, top-20 via TakeOrderedAndProject.
    "q125_collocations" -> ((s, dir) =>
      operators.TextRank.collocations(t(s, dir, "documents"),
        "doc_id", "text", minCount = 5L, topK = 20)),

    // tf/df keyword extraction: per-doc top-3 salient terms by the exact
    // integer ratio ⌊tf·10⁶/df⌋ (stopwords sink, distinctive repeats
    // rise); the rk<=3 predicate rewrites to WindowGroupLimit so map
    // tasks keep local top-k heaps BEFORE the exchange.
    "q119_tfdf_keywords" -> ((s, dir) =>
      operators.TextRank.tfDfKeywords(t(s, dir, "documents"),
        "doc_id", "text", topK = 3)),

    // Composed pre-dedup filter stack (the RefinedWeb/C4 cleaning DAG's
    // scalar stage): blocklist + entropy + the Gopher rule bundle as ONE
    // decision table over ONE scan — every signal is codegen'd scalar
    // work, so the whole stack costs a single pass at 100 TB (the spec
    // pins zero exchanges and one parquet scan).
    "q107_filter_stack" -> ((s, dir) => {
      functions.Blocklist.register(s)
      functions.CharEntropyFn.register(s)
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"),
        functions.Blocklist.blocklistHits(
          trim(lower(col("text"))), blocklistPats).as("n_hits"),
        functions.CharEntropyFn.charEntropy(col("text")).as("entropy_micro"))
      operators.GopherRules.decisions(base, "doc_id", "text",
          minWords = 20L, carry = Seq("n_hits", "entropy_micro"))
        .select(col("doc_id"), (col("n_hits") === 0L).as("ok_blocklist"),
          (col("entropy_micro") >= 2500000L).as("ok_entropy"),
          col("pass").as("ok_gopher"))
        .withColumn("keep",
          col("ok_blocklist") && col("ok_entropy") && col("ok_gopher"))
    }),

    // Character-entropy quality signal (compression-ratio proxy): one
    // byte-histogram pass per document, entropy in integer micro-nats.
    "q106_char_entropy" -> ((s, dir) => {
      functions.CharEntropyFn.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        functions.CharEntropyFn.charEntropy(col("text")).as("entropy_micro"))
        .withColumn("low_entropy", col("entropy_micro") < lit(2500000L))
    }),

    // Aho–Corasick blocklist filter (the C4 banned-word rule: any hit
    // blocks): one automaton pass per document counts ALL occurrences
    // (overlaps + nested suffixes included) of the whole pattern set.
    "q105_blocklist" -> ((s, dir) => {
      functions.Blocklist.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        functions.Blocklist.blocklistHits(
          trim(lower(col("text"))), blocklistPats).as("n_hits"),
        functions.Blocklist.blocklistTerms(
          trim(lower(col("text"))), blocklistPats).as("n_terms"))
        .withColumn("blocked", col("n_hits") > lit(0L))
    }),

    // Gopher-rules quality pre-filter (Rae et al. 2021 §A1.1): per-rule
    // boolean decision table over documents, all integer-arithmetic
    // thresholds, one scan, no UDFs. minWords=20 so the 10..99-word
    // corpus discriminates on the word-count rule.
    "q93_gopher_rules" -> ((s, dir) =>
      operators.GopherRules.decisions(
        t(s, dir, "documents"), "doc_id", "text", minWords = 20L)),

    // Grouped top-p (nucleus) filtering — the sampling-prep op an LLM
    // data/serving pipeline applies per distribution: per language, keep
    // the smallest (freq desc, tok) prefix of the token distribution
    // whose cumulative mass reaches 80% — strict integer rule
    // (cum_before·100 < 80·total keeps), one rank window per group.
    "q197_nucleus" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("f").desc, col("tok"))
      val freq = t(s, dir, "documents")
        .select(col("lang"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("f"))
      freq
        .withColumn("cum_before", coalesce(sum(col("f")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("f")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .where(col("cum_before") * 100 < col("total") * 80)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("nucleus_size"),
          sum(col("f")).as("nucleus_mass"),
          max(col("total")).as("total"))
        .withColumn("mass_ppm", expr("nucleus_mass * 1000000 div total"))
    }),

    // Split-leakage audit: group-aware train/val assignment (all of a
    // user's events follow the user's hash) must have ZERO user overlap —
    // the audit every supervised pipeline should run and few do. One
    // distinct pass + a self-join-free overlap census via per-user
    // distinct-split counts.
    "q198_leakage_audit" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_id"))
        .withColumn("split",
          when(substring(md5(concat(col("user_id").cast("string"),
            lit("#split#"))), 1, 2) < "cd",
            lit("train")).otherwise(lit("val")))
      val users = e.select(col("user_id"), col("split")).distinct()
      val overlap = users.groupBy(col("user_id"))
        .agg(countDistinct(col("split")).as("k"))
        .agg(coalesce(sum(when(col("k") > 1, 1L)), lit(0L))
          .as("leaked_users"))
      e.groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .crossJoin(broadcast(overlap))
    }),

    // TextRank keywords (Mihalcea & Tarau 2004): adjacent-token
    // co-occurrence edges (both directions, distinct, no self-loops)
    // fed to the SAME integer fixed-point PageRank as q77 — a pure
    // composition gate; top-20 by (rank desc, word).
    "q189_textrank" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(trim(lower(col("text"))), "\\s+"))
            .as(Seq("pos", "tok")))
      val bi = toks.as("x").join(toks.as("y"),
          col("x.doc_id") === col("y.doc_id") &&
          col("y.pos") === col("x.pos") + 1)
        .select(col("x.tok").as("a"), col("y.tok").as("b"))
        .where(length(col("a")) > 0 && length(col("b")) > 0 &&
          col("a") =!= col("b"))
      val edges = bi.unionByName(
        bi.select(col("b").as("a"), col("a").as("b"))).distinct()
      val pr = Graph.pageRankE9(edges, "a", "b", iterations = 3)
      pr.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(operators.Census.onePartKey(col("rank_e9")))
            .orderBy(col("rank_e9").desc, col("a"))).cast("long"))
        .where(col("rk") <= 20)
        .select(col("a").as("word"), col("rank_e9"), col("rk"))
    }),

    // Tokenizer-design census: corpus token coverage of the top-N vocab
    // for N ∈ {100, 1000, 10000} — one token scan, vocab-sized global
    // rank window (vocab ≪ corpus), integer ppm.
    "q187_vocab_coverage" -> ((s, dir) => {
      val freq = t(s, dir, "documents")
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
        .where(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val ranked = freq.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(operators.Census.onePartKey(col("f")))
            .orderBy(col("f").desc, col("tok"))).cast("long"))
      val tot = freq.agg(sum(col("f")).as("tot_toks"))
      val sizes = s.range(1).select(
        explode(array(lit(100L), lit(1000L), lit(10000L))).as("n_vocab"))
      ranked
        .crossJoin(broadcast(sizes))
        .where(col("rk") <= col("n_vocab"))
        .groupBy(col("n_vocab")).agg(sum(col("f")).as("covered"))
        .crossJoin(broadcast(tot))
        .select(col("n_vocab"), col("covered"), col("tot_toks"),
          expr("covered * 1000000 div tot_toks").as("coverage_ppm"))
    }),

    // Heaps-law vocabulary growth: distinct-word count after each
    // 100-doc ingestion bucket — exact saturation curve, no sketch.
    "q237_vocab_growth" -> ((s, dir) =>
      operators.CorpusOps.vocabGrowth(
        t(s, dir, "documents"), "doc_id", "text", bucketSize = 100L)),

    // Positional phrase search: postings pruned to the phrase's own
    // terms before any shuffle, L−1 adjacency equi-joins on
    // (doc, normalized start) — quoted-query retrieval over documents.
    "q263_phrase_search" -> ((s, dir) =>
      operators.PhraseIndex.phraseMatches(t(s, dir, "documents"),
        col("doc_id"), col("text"), Seq("row", "column", "sort"))),

    // Autocomplete index build (serving prep): explode every term into
    // its 1–4-char prefixes, keep the top 3 completions per prefix by
    // (count desc, term) — the per-prefix window runs over prefix
    // groups (bounded by vocabulary), never corpus rows.
    "q281_autocomplete" -> ((s, dir) => {
      val terms = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .where(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("prefix"))
        .orderBy(col("cnt").desc, col("term").asc)
      terms.select(col("term"), col("cnt"),
          explode(sequence(lit(1), least(lit(4), length(col("term")))))
            .as("plen"))
        .withColumn("prefix", expr("substr(term, 1, plen)"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("prefix"), col("rank"), col("term"), col("cnt"))
    }),

    // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases =
    // maximal non-stopword runs (1–4 words), word score = deg/freq over
    // phrase co-membership, phrase score = Σ word scores — all integer
    // (e6-truncated per word). One per-doc position window builds the
    // islands; the word table (≤ vocabulary) broadcasts back onto the
    // distinct phrases. Top 25 under a total order.
    "q302_rake" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .where(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("i", "w")))
      val isStop = col("w").isin(q302Stopwords: _*)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val phrases = toks
        .withColumn("ph", sum(isStop.cast("long")).over(w))
        .where(!isStop)
        .groupBy(col("doc_id"), col("ph"))
        .agg(expr("transform(array_sort(collect_list(struct(i, w))), x -> x.w)")
          .as("ws"))
        .where(size(col("ws")).between(1, 4))
      val words = phrases
        .select(explode(col("ws")).as("w"), size(col("ws")).as("len"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
        .withColumn("wscore_e6", expr("deg * 1000000L div freq"))
      val phraseCounts = phrases
        .groupBy(array_join(col("ws"), " ").as("phrase"))
        .agg(count(lit(1)).as("n"))
      val phraseScores = phrases
        .select(array_join(col("ws"), " ").as("phrase"), col("ws")).distinct()
        .select(col("phrase"), explode(col("ws")).as("w"))
        .join(broadcast(words.select(col("w"), col("wscore_e6"))), "w")
        .groupBy(col("phrase")).agg(sum(col("wscore_e6")).as("score_e6"))
      phraseCounts.join(phraseScores, "phrase")
        .orderBy(col("score_e6").desc, col("phrase")).limit(25)
    }),

    // Zipf-law slope of the corpus rank–frequency head (top-1000 by
    // (count DESC, word)): exact integer OLS of ln-freq on ln-rank —
    // the one-number vocabulary-health summary next to q115's
    // spectrum; natural text sits near −1.
    "q379_zipf_slope" -> ((s, dir) =>
      decStr(operators.CorpusOps.zipfSlopeE6(t(s, dir, "documents"),
        "doc_id", "text", topK = 1000))),

    // Luhn extractive summarization (simplified density form): each
    // document's most significant-word-dense sentence, significance =
    // the mid-band of the corpus frequency spectrum — the cheap
    // self-summary a curation pipeline attaches to every doc.
    "q404_luhn_summary" -> ((s, dir) =>
      operators.Summarize.luhnBest(t(s, dir, "documents"), "doc_id",
        "text", minFreq = 10L, maxFreq = 1000L)),

    // Burrows' Delta provenance attribution: each document's top-30
    // function-word z-profile matched to the nearest SOURCE profile —
    // the stylometric "which source does this style belong to" audit,
    // with per-doc correctness against the actual source.
    "q414_burrows_delta" -> ((s, dir) =>
      operators.Stylometry.burrowsDeltaAttribution(
        t(s, dir, "documents"), "doc_id", "text", "source",
        topWords = 30)),

    // CCNet-shape perplexity filter (Wenzek et al. 2020): held-out docs
    // scored by mean per-token cost under the train-split add-one
    // unigram LM, fixed half-nat bands per source — the quality-cut
    // histogram a filtering pass reads. Split strides WITHIN each
    // source ((doc_id div 20) mod 5 — source is doc_id mod 20 in this
    // corpus, so a bare mod split would hold out whole sources). Fixed
    // bands, not CCNet's terciles: the output stays (source × band)
    // census grain at any scale.
    "q426_ppl_filter" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.CorpusOps.pplFilterBands(
        d.where(pmod(expr("doc_id div 20"), lit(5L)) < 4L),
        d.where(pmod(expr("doc_id div 20"), lit(5L)) >= 4L),
        "text", "doc_id", "source", bandNatsE6 = 500000L, maxBand = 20L)
        .withColumnRenamed("group", "source")
    }),

    // OOV audit: vocabulary from the train split (doc_id % 10 < 8,
    // count ≥ 2), token- and type-level out-of-vocabulary rates per
    // source on the held-out docs — the coverage check run before
    // freezing a tokenizer vocab.
    "q375_oov_rate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.CorpusOps.oovRate(
        d.where(pmod(col("doc_id"), lit(10L)) < 8L),
        d.where(pmod(col("doc_id"), lit(10L)) >= 8L),
        "text", "source", minCount = 2L)
        .withColumnRenamed("group", "source")
    }),

    // Flesch / Flesch–Kincaid readability per source — the prose-
    // difficulty index every corpus data card reports, exact e3
    // integers under pinned counting rules (vowel-group syllables,
    // [.!?]+ sentence runs, min-1 clamps); one scan, the token work
    // stays inside each row's array (no token-grain shuffle).
    "q371_readability" -> ((s, dir) =>
      operators.Readability.fleschKincaid(t(s, dir, "documents"),
        col("text"), Seq("source"))),

    // Windowed PPMI co-occurrence (the skip-gram statistic SGNS
    // factorizes — Levy & Goldberg 2014): directed (word, context)
    // pairs at offsets 1–2 built inside each token array, PMI by the
    // q125-pinned three-ln chain, clamped at 0, min-count 5, top-30
    // with a total order.
    "q372_ppmi_window" -> ((s, dir) =>
      operators.TextRank.ppmiWindow(t(s, dir, "documents"),
        "doc_id", "text", minCount = 5L, topK = 30)),

    // Corpus DATA CARD: the one-row nutrition label published next to a
    // training corpus (docs/tokens/chars, source+language spread, exact
    // duplicate mass by full-text md5, English share, length profile) —
    // every figure integer and ONE scan plus the distinct censuses; the
    // composed headline over the q16/q13/q135 machinery.
    "q323_data_card" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("toks", size(split(trim(col("text")), "\\s+"))
          .cast("long"))
        .withColumn("fp", md5(col("text")))
      d.agg(
        count(lit(1)).as("docs"),
        countDistinct(col("source")).as("sources"),
        countDistinct(col("lang")).as("langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"),
        countDistinct(col("fp")).as("distinct_texts"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en_docs"),
        min(col("toks")).as("min_tokens"), max(col("toks")).as("max_tokens"))
        .withColumn("dup_ppm",
          expr("(docs - distinct_texts) * 1000000L div docs"))
        .withColumn("en_ppm", expr("en_docs * 1000000L div docs"))
        .withColumn("mean_tokens_e2",
          expr("total_tokens * 100L div docs"))
    }),
  )

  /** Shared oracle CTEs for q454/q455/q456: the pair frame plus
    * per-side gram censuses and per-n overlap/total stats. */
  private val q454StatCtes: String = {
    def gram(n: Int, tcol: String, tag: String): String =
      if (n == 1)
        s"""${tag}g$n AS (SELECT source, pr, g,
           |  CAST(count(*) AS BIGINT) AS c
           | FROM (SELECT source, pr, unnest(regexp_split_to_array(
           |    trim(lower($tcol)), '\\s+')) AS g FROM p)
           | GROUP BY 1, 2, 3)""".stripMargin
      else
        s"""${tag}g$n AS (SELECT source, pr, g,
           |  CAST(count(*) AS BIGINT) AS c
           | FROM (SELECT source, pr,
           |   array_to_string(ts[i:i+${n - 1}], ' ') AS g
           |  FROM (SELECT source, pr, regexp_split_to_array(
           |     trim(lower($tcol)), '\\s+') AS ts FROM p),
           |  UNNEST(range(1, len(ts) - ${n - 2})) AS t(i))
           | GROUP BY 1, 2, 3)""".stripMargin
    def stats(n: Int): String =
      s"""s$n AS (SELECT p.source, p.pr,
         |  COALESCE(ov.o, 0) AS o_$n,
         |  COALESCE(rt.r, 0) AS r_$n,
         |  COALESCE(cc.c, 0) AS c_$n
         | FROM p
         | LEFT JOIN (SELECT rg.source, rg.pr,
         |    CAST(sum(least(rg.c, cg.c)) AS BIGINT) AS o
         |   FROM rg$n rg JOIN cg$n cg
         |    ON cg.source = rg.source AND cg.pr = rg.pr AND cg.g = rg.g
         |   GROUP BY 1, 2) ov
         |  ON ov.source = p.source AND ov.pr = p.pr
         | LEFT JOIN (SELECT source, pr, CAST(sum(c) AS BIGINT) AS r
         |   FROM rg$n GROUP BY 1, 2) rt
         |  ON rt.source = p.source AND rt.pr = p.pr
         | LEFT JOIN (SELECT source, pr, CAST(sum(c) AS BIGINT) AS c
         |   FROM cg$n GROUP BY 1, 2) cc
         |  ON cc.source = p.source AND cc.pr = p.pr)""".stripMargin
    s"""d AS (SELECT source, doc_id, text,
       |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       | FROM documents),
       |r0 AS (SELECT source, (rn + 1) // 2 AS pr, text AS rt FROM d
       | WHERE rn % 2 = 1),
       |c0 AS (SELECT source, rn // 2 AS pr, text AS ct FROM d
       | WHERE rn % 2 = 0),
       |p AS (SELECT r0.source, r0.pr, rt, ct FROM r0 JOIN c0
       | USING (source, pr)),
       |${gram(1, "rt", "r")},
       |${gram(1, "ct", "c")},
       |${gram(2, "rt", "r")},
       |${gram(2, "ct", "c")},
       |${stats(1)},
       |${stats(2)}""".stripMargin
  }

  /** q459: char-gram censuses for all orders in one lateral unnest
    * chain (n from range, i correlated on len(tx) − n + 1), clipped
    * overlap + totals per (pair, n) on the zero-filled pair × order
    * grid, truncating e6 divisions — mirrors `TextEval.chrFE6`'s
    * pinned conventions exactly (lowercase, whitespace stripped,
    * empty orders contribute 0). */
  private val q459OracleSql: String = {
    def side(tcol: String, tag: String): String =
      s"""${tag}t AS (SELECT source, pr,
         |  regexp_replace(lower($tcol), '\\s+', '', 'g') AS tx FROM p),
         |${tag}g AS (SELECT source, pr, n, substr(tx, i, n) AS g,
         |  CAST(count(*) AS BIGINT) AS c
         | FROM ${tag}t,
         |  UNNEST(range(1, 7)) AS tn(n),
         |  UNNEST(range(1, len(tx) - n + 2)) AS ti(i)
         | WHERE len(tx) >= n
         | GROUP BY 1, 2, 3, 4)""".stripMargin
    s"""WITH d AS (SELECT source, doc_id, text,
       |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       | FROM documents),
       |r0 AS (SELECT source, (rn + 1) // 2 AS pr, text AS rt FROM d
       | WHERE rn % 2 = 1),
       |c0 AS (SELECT source, rn // 2 AS pr, text AS ct FROM d
       | WHERE rn % 2 = 0),
       |p AS (SELECT r0.source, r0.pr, rt, ct
       | FROM r0 JOIN c0 USING (source, pr)),
       |${side("rt", "r")},
       |${side("ct", "c")},
       |grid AS (SELECT source, pr, n FROM p, UNNEST(range(1, 7)) AS tn(n)),
       |st AS (SELECT grid.source, grid.pr, grid.n,
       |  COALESCE(ov.o, 0) AS o, COALESCE(rt2.r, 0) AS r,
       |  COALESCE(ct2.c, 0) AS c
       | FROM grid
       | LEFT JOIN (SELECT rg.source, rg.pr, rg.n,
       |    CAST(sum(least(rg.c, cg.c)) AS BIGINT) AS o
       |   FROM rg JOIN cg ON cg.source = rg.source AND cg.pr = rg.pr
       |    AND cg.n = rg.n AND cg.g = rg.g
       |   GROUP BY 1, 2, 3) ov
       |  ON ov.source = grid.source AND ov.pr = grid.pr AND ov.n = grid.n
       | LEFT JOIN (SELECT source, pr, n, CAST(sum(c) AS BIGINT) AS r
       |   FROM rg GROUP BY 1, 2, 3) rt2
       |  ON rt2.source = grid.source AND rt2.pr = grid.pr
       |   AND rt2.n = grid.n
       | LEFT JOIN (SELECT source, pr, n, CAST(sum(c) AS BIGINT) AS c
       |   FROM cg GROUP BY 1, 2, 3) ct2
       |  ON ct2.source = grid.source AND ct2.pr = grid.pr
       |   AND ct2.n = grid.n),
       |pn AS (SELECT source, pr,
       |  CASE WHEN c > 0 THEN o * 1000000 // c ELSE 0 END AS p_n,
       |  CASE WHEN r > 0 THEN o * 1000000 // r ELSE 0 END AS r_n
       | FROM st),
       |agg AS (SELECT source, pr,
       |  CAST(sum(p_n) // 6 AS BIGINT) AS chrp_e6,
       |  CAST(sum(r_n) // 6 AS BIGINT) AS chrr_e6
       | FROM pn GROUP BY 1, 2)
       |SELECT source, pr, chrp_e6, chrr_e6,
       | CASE WHEN 4 * chrp_e6 + chrr_e6 > 0
       |  THEN 5 * chrp_e6 * chrr_e6 // (4 * chrp_e6 + chrr_e6)
       |  ELSE 0 END AS chrf2_e6
       |FROM agg""".stripMargin
  }

  private val q454OracleSql: String =
    s"""WITH $q454StatCtes
       |SELECT s1.source, s1.pr,
       | CASE WHEN r_1 > 0 THEN o_1 * 1000000 // r_1 ELSE 0 END
       |  AS rouge1_recall_e6,
       | CASE WHEN c_1 > 0 THEN o_1 * 1000000 // c_1 ELSE 0 END
       |  AS rouge1_precision_e6,
       | CASE WHEN r_1 + c_1 > 0 THEN 2 * o_1 * 1000000 // (r_1 + c_1)
       |  ELSE 0 END AS rouge1_f1_e6,
       | CASE WHEN r_2 > 0 THEN o_2 * 1000000 // r_2 ELSE 0 END
       |  AS rouge2_recall_e6,
       | CASE WHEN c_2 > 0 THEN o_2 * 1000000 // c_2 ELSE 0 END
       |  AS rouge2_precision_e6,
       | CASE WHEN r_2 + c_2 > 0 THEN 2 * o_2 * 1000000 // (r_2 + c_2)
       |  ELSE 0 END AS rouge2_f1_e6
       |FROM s1 JOIN s2 ON s2.source = s1.source AND s2.pr = s1.pr"""
      .stripMargin

  private val q455OracleSql: String =
    s"""WITH $q454StatCtes
       |SELECT s1.source, s1.pr, o_1, o_2,
       | r_1 AS ref_len, c_1 AS cand_len,
       | CASE WHEN o_1 = 0 OR o_2 = 0 OR c_1 = 0 OR c_2 = 0 THEN 0
       |  ELSE CAST(round(
       |   (CASE WHEN c_1 >= r_1 THEN 1.0
       |     ELSE exp(1.0 - CAST(r_1 AS DOUBLE)
       |       / CAST(c_1 AS DOUBLE)) END)
       |   * sqrt((CAST(o_1 AS DOUBLE) / CAST(c_1 AS DOUBLE))
       |        * (CAST(o_2 AS DOUBLE) / CAST(c_2 AS DOUBLE)))
       |   * 1000000.0) AS BIGINT) END AS bleu2_e6
       |FROM s1 JOIN s2 ON s2.source = s1.source AND s2.pr = s1.pr"""
      .stripMargin

  private val q456OracleSql: String =
    """WITH d AS (SELECT source, doc_id, text,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      | FROM documents),
      |r0 AS (SELECT source, (rn + 1) // 2 AS pr, text AS rt FROM d
      | WHERE rn % 2 = 1),
      |c0 AS (SELECT source, rn // 2 AS pr, text AS ct FROM d
      | WHERE rn % 2 = 0),
      |p AS (SELECT r0.source, r0.pr,
      |  substr(rt, 1, 200) AS a, substr(ct, 1, 200) AS b
      | FROM r0 JOIN c0 USING (source, pr))
      |SELECT source, pr,
      | CAST(length(a) AS BIGINT) AS len_a,
      | CAST(length(b) AS BIGINT) AS len_b,
      | CAST(levenshtein(a, b) AS BIGINT) AS dist,
      | CASE WHEN greatest(length(a), length(b)) > 0
      |  THEN CAST(levenshtein(a, b) AS BIGINT) * 1000000
      |   // CAST(greatest(length(a), length(b)) AS BIGINT)
      |  ELSE 0 END AS norm_e6
      |FROM p""".stripMargin

  def oracleSql: Seq[(String, String)] = Seq(
    "q454_rouge" -> q454OracleSql,
    "q455_bleu2" -> q455OracleSql,
    "q456_edit_distance" -> q456OracleSql,
    "q459_chrf" -> q459OracleSql,
    "q44_split_assign" ->
      """SELECT doc_id,
        | substr(md5(CAST(doc_id AS VARCHAR) || '#split#v1'), 1, 2) AS bucket,
        | CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#split#v1'), 1, 2) < '0d' THEN 'test'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#split#v1'), 1, 2) < '1a' THEN 'val'
        |      ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "q45_pack_sequences" ->
      """WITH tok AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |packed AS (
        | SELECT doc_id, source, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
        | FROM tok)
        |SELECT doc_id, source, n_tokens,
        | CAST(start_off // 512 AS BIGINT) AS chunk_id,
        | CAST(start_off % 512 AS BIGINT) AS chunk_off
        |FROM packed""".stripMargin,

    "q46_pii_scrub" ->
      """WITH inj AS (
        | SELECT doc_id, text
        |  || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' see https://example.org/d/' || CAST(doc_id AS VARCHAR) ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' call +1 555 867 5309' ELSE '' END AS t
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(t, 'https?://[^ \t\n\r]+')) AS BIGINT) AS n_urls,
        | CAST(len(regexp_extract_all(t, '\+[0-9][0-9 ]{7,}[0-9]')) AS BIGINT) AS n_phones,
        | regexp_replace(regexp_replace(regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   'https?://[^ \t\n\r]+', '<URL>', 'g'),
        |   '\+[0-9][0-9 ]{7,}[0-9]', '<PHONE>', 'g') AS redacted
        |FROM inj""".stripMargin,

    "q47_contamination" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ts
        | FROM documents),
        |grams AS (
        | SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
        | FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i))
        |SELECT tr.doc_id,
        | COUNT(DISTINCT tr.g) AS n_shared_grams,
        | COUNT(DISTINCT te.doc_id) AS n_test_docs
        |FROM (SELECT * FROM grams WHERE doc_id % 50 <> 0) tr
        |JOIN (SELECT * FROM grams WHERE doc_id % 50 = 0) te ON tr.g = te.g
        |GROUP BY tr.doc_id""".stripMargin,

    "q49_mixture_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || '#mix#v1'), 1, 2) <
        | CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
        |      THEN 'cc' ELSE '33' END""".stripMargin,

    "q48_length_quantiles" ->
      """WITH base AS (
        | SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#split#v1'), 1, 2) < '0d' THEN 'test'
        |             WHEN substr(md5(CAST(doc_id AS VARCHAR) || '#split#v1'), 1, 2) < '1a' THEN 'val'
        |             ELSE 'train' END AS split,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |hist AS (
        | SELECT split, n_tokens, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |cum AS (
        | SELECT split, n_tokens,
        |  SUM(c) OVER (PARTITION BY split ORDER BY n_tokens
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(c) OVER (PARTITION BY split) AS n
        | FROM hist)
        |SELECT split, CAST(MAX(n) AS BIGINT) AS n_rows,
        | MIN(CASE WHEN cum * 100 >= n * 50 THEN n_tokens END) AS p50,
        | MIN(CASE WHEN cum * 100 >= n * 90 THEN n_tokens END) AS p90,
        | MIN(CASE WHEN cum * 100 >= n * 99 THEN n_tokens END) AS p99
        |FROM cum GROUP BY 1""".stripMargin,

    "q16_text_stats" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_uniq_tokens,
        | CAST(length(text) AS BIGINT) AS n_chars_actual,
        | greatest(least(
        |   CAST(floor(least(len(regexp_split_to_array(trim(text), '\s+')), 40) * 25 / 40) AS BIGINT)
        |   + CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
        |      THEN CAST(floor(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) * 50
        |                      / len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |      ELSE 0 END
        |   + (25 - CASE WHEN length(text) > 0
        |      THEN least(CAST(floor((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 100 / length(text)) AS BIGINT), 25)
        |      ELSE 0 END),
        |  100), 0) AS quality
        |FROM documents""".stripMargin,

    "q17_lang_stats" ->
      s"""WITH t AS (
         | SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS tk
         | FROM documents),
         |h AS (SELECT doc_id, lang, $langHitsSql, len(tk) AS ntok FROM t)
         |SELECT lang, $langCaseSql AS detected,
         | count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens
         |FROM h GROUP BY 1, 2""".stripMargin,

    "q28_bpe_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT) AS n_bpe,
        | CAST(len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT) AS n_bpe_lower
        |FROM documents""".stripMargin,

    "q40_repetition" ->
      """WITH u AS (
        | SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS un
        | FROM documents),
        |f AS (SELECT doc_id, un FROM u WHERE trim(un) <> ''),
        |c AS (SELECT doc_id, un, count(*) AS cnt FROM f GROUP BY 1, 2)
        |SELECT doc_id,
        | CAST(sum(cnt) AS BIGINT) AS n_units,
        | count(*) AS n_uniq_units,
        | CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
        |   AS n_dup_units,
        | CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(un) ELSE 0 END) AS BIGINT)
        |   AS dup_unit_chars,
        | CAST(sum(cnt * length(un)) AS BIGINT) AS total_unit_chars
        |FROM c GROUP BY doc_id""".stripMargin,

    // q443: per-n gram frames rebuilt with 1-based inclusive slices
    // (the q47 technique); range() stop-exclusive bounds give exactly
    // len−n+1 grams per document.
    "q443_distinct_ngrams" ->
      """WITH toks AS (SELECT source AS grp,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        | FROM documents),
        |g1 AS (SELECT grp, unnest(ts) AS g FROM toks),
        |g2 AS (SELECT grp, array_to_string(ts[i:i+1], ' ') AS g
        | FROM toks, UNNEST(range(1, len(ts))) AS t(i)),
        |g3 AS (SELECT grp, array_to_string(ts[i:i+2], ' ') AS g
        | FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i)),
        |p1 AS (SELECT grp, CAST(1 AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS total_grams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams
        | FROM g1 GROUP BY grp),
        |p2 AS (SELECT grp, CAST(2 AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS total_grams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams
        | FROM g2 GROUP BY grp),
        |p3 AS (SELECT grp, CAST(3 AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS total_grams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_grams
        | FROM g3 GROUP BY grp),
        |u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
        | UNION ALL SELECT * FROM p3)
        |SELECT grp AS source, n, total_grams, distinct_grams,
        | CAST(CAST(distinct_grams AS HUGEINT) * 1000000 // total_grams
        |  AS BIGINT) AS distinct_e6
        |FROM u""".stripMargin,

    "q59_quality_classifier" -> q59OracleSql,

    // Chunk rows rebuild from the same stride grid + tail-aligned start;
    // DuckDB range() is stop-exclusive where Spark sequence() is
    // inclusive, hence the +1. List slices are 1-based inclusive on both.
    "q99_chunk_overlap" ->
      """WITH d AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
        |ls AS (SELECT doc_id, greatest(len(toks) - 15, 1) AS last_start FROM d),
        |st AS (SELECT DISTINCT doc_id, start FROM (
        |  SELECT doc_id, unnest(range(1, last_start + 1, 8)) AS start FROM ls
        |  UNION ALL SELECT doc_id, last_start AS start FROM ls))
        |SELECT d.doc_id, CAST(start AS BIGINT) AS start,
        |  CAST(len(toks[start:start+15]) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[start:start+15], ' ') AS chunk
        |FROM st JOIN d USING (doc_id)""".stripMargin,

    // q153: value census + strictly-below cumulative, percent_rank in
    // floored ppm.
    "q153_quality_percentile" ->
      s"""WITH q AS (SELECT doc_id, $qualityExprSql AS v FROM documents),
         |c AS (SELECT v, count(*) AS cnt FROM q GROUP BY 1),
         |r AS (SELECT v, coalesce(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
         |  sum(cnt) OVER () AS n FROM c)
         |SELECT doc_id, CAST(q.v AS BIGINT) AS value,
         |  CAST(CASE WHEN n > 1 THEN below * 1000000 // (n - 1)
         |    ELSE 0 END AS BIGINT) AS pct_ppm
         |FROM q JOIN r ON r.v = q.v""".stripMargin,

    // q134/q135: component chain + quality replay composed.
    "q134_quality_canon" -> q134OracleSql,
    "q135_lang_report" -> q135OracleSql,

    // q125: the same unigram/bigram censuses and the identical pinned
    // ln-chain; order + limit replicated (pmi desc, a, b).
    "q125_collocations" ->
      """WITH tk AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
        |u AS (SELECT unnest(t) AS w FROM tk),
        |cu AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
        |n1 AS (SELECT count(*) AS c FROM u),
        |bg AS (SELECT t[i] AS a, t[i+1] AS b FROM tk,
        |  LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) ix
        | WHERE len(t) >= 2),
        |n2 AS (SELECT count(*) AS c FROM bg),
        |cb AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2
        |       HAVING count(*) >= 5)
        |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(ca.c AS BIGINT) AS c_a, CAST(cbb.c AS BIGINT) AS c_b,
        |  CAST(round((ln(CAST(c_ab AS DOUBLE) / CAST(n2.c AS DOUBLE))
        |    - ln(CAST(ca.c AS DOUBLE) / CAST(n1.c AS DOUBLE))
        |    - ln(CAST(cbb.c AS DOUBLE) / CAST(n1.c AS DOUBLE)))
        |   * 1000000.0) AS BIGINT) AS pmi_e6
        |FROM cb JOIN cu ca ON ca.w = cb.a JOIN cu cbb ON cbb.w = cb.b,
        |  n1, n2
        |ORDER BY pmi_e6 DESC, a, b LIMIT 20""".stripMargin,

    // q119: per-doc top-3 by ⌊tf·10⁶/df⌋, (score desc, term asc) ties.
    "q119_tfdf_keywords" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(
        |   trim(lower(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
        |       WHERE length(term) > 0 GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  tf.tf * 1000000 // df.df AS score_e6 FROM tf JOIN df USING (term)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score_e6 DESC, term) AS rk FROM s)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, CAST(score_e6 AS BIGINT) AS score_e6,
        |  CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3""".stripMargin,

    "q107_filter_stack" -> q107OracleSql,

    "q106_char_entropy" -> q106OracleSql,

    "q105_blocklist" -> q105OracleSql,

    // Engine-parity notes: DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all; the corpus has no newlines, so the line
    // splits agree despite trailing-empty semantics differing (the
    // synthetic-text line rules are pinned engine-side in GopherRulesSpec).
    "q93_gopher_rules" -> q93OracleSql,

    // q197: same strict prefix rule per language.
    "q197_nucleus" ->
      """WITH f AS (SELECT lang, tok, count(*) AS f FROM (
        |  SELECT lang, unnest(regexp_split_to_array(trim(lower(text)),
        |    '\s+')) AS tok FROM documents)
        | WHERE length(tok) > 0 GROUP BY 1, 2),
        |w AS (SELECT lang, tok, f,
        |  coalesce(sum(f) OVER (PARTITION BY lang ORDER BY f DESC, tok
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cum_before,
        |  sum(f) OVER (PARTITION BY lang) AS total FROM f)
        |SELECT lang, CAST(count(*) AS BIGINT) AS nucleus_size,
        | CAST(sum(f) AS BIGINT) AS nucleus_mass,
        | CAST(max(total) AS BIGINT) AS total,
        | CAST(sum(f) * 1000000 // max(total) AS BIGINT) AS mass_ppm
        |FROM w WHERE cum_before * 100 < total * 80 GROUP BY 1""".stripMargin,

    // q198: md5 group-hash split, per-user distinct-split census, zero
    // overlap by construction — the audit must prove it.
    "q198_leakage_audit" ->
      """WITH e AS (SELECT user_id, event_id,
        |  CASE WHEN substr(md5(CAST(user_id AS VARCHAR) || '#split#'),
        |    1, 2) < 'cd' THEN 'train' ELSE 'val' END AS split
        | FROM events),
        |u AS (SELECT DISTINCT user_id, split FROM e),
        |o AS (SELECT coalesce(sum(CASE WHEN k > 1 THEN 1 END), 0)
        |    AS leaked_users
        | FROM (SELECT user_id, count(DISTINCT split) AS k FROM u
        |       GROUP BY 1))
        |SELECT split, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(o.leaked_users AS BIGINT) AS leaked_users
        |FROM e CROSS JOIN o GROUP BY 1, o.leaked_users""".stripMargin,

    // q189: the q77 integer PageRank unrolled 3 rounds over the bigram
    // co-occurrence edges — base 150000000, contribution r div d,
    // damped (85·m) div 100, dangling mass evaporates.
    "q189_textrank" ->
      """WITH arrs AS (SELECT doc_id,
        |   regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents),
        |bi0 AS (SELECT unnest(list_zip(a, a[2:])) AS z FROM arrs),
        |bi AS (SELECT z[1] AS a, z[2] AS b FROM bi0
        | WHERE z[1] IS NOT NULL AND z[2] IS NOT NULL
        |  AND length(z[1]) > 0 AND length(z[2]) > 0 AND z[1] <> z[2]),
        |e AS (SELECT DISTINCT a, b FROM
        | (SELECT a, b FROM bi UNION ALL SELECT b, a FROM bi)),
        |deg AS (SELECT a, count(*) AS d FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT id FROM
        | (SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT e.b AS id, sum(r0.r // deg.d) AS m FROM e
        | JOIN deg ON deg.a = e.a JOIN r0 ON r0.id = e.a GROUP BY 1),
        |r1 AS (SELECT n.id, CAST(150000000 + (85 * coalesce(c1.m, 0)) // 100
        |   AS BIGINT) AS r FROM nodes n LEFT JOIN c1 USING (id)),
        |c2 AS (SELECT e.b AS id, sum(r1.r // deg.d) AS m FROM e
        | JOIN deg ON deg.a = e.a JOIN r1 ON r1.id = e.a GROUP BY 1),
        |r2 AS (SELECT n.id, CAST(150000000 + (85 * coalesce(c2.m, 0)) // 100
        |   AS BIGINT) AS r FROM nodes n LEFT JOIN c2 USING (id)),
        |c3 AS (SELECT e.b AS id, sum(r2.r // deg.d) AS m FROM e
        | JOIN deg ON deg.a = e.a JOIN r2 ON r2.id = e.a GROUP BY 1),
        |r3 AS (SELECT n.id, CAST(150000000 + (85 * coalesce(c3.m, 0)) // 100
        |   AS BIGINT) AS r FROM nodes n LEFT JOIN c3 USING (id))
        |SELECT id AS word, r AS rank_e9, rk FROM (SELECT id, r,
        |   CAST(row_number() OVER (ORDER BY r DESC, id) AS BIGINT) AS rk
        |  FROM r3) WHERE rk <= 20""".stripMargin,

    // q187: one token census, (freq desc, tok) global rank, prefix
    // coverage at the three literal vocab sizes.
    "q187_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(
        |   trim(lower(text)), '\s+')) AS tok FROM documents),
        |f AS (SELECT tok, count(*) AS f FROM toks
        | WHERE length(tok) > 0 GROUP BY 1),
        |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS rk
        | FROM f),
        |tot AS (SELECT sum(f) AS tot_toks FROM f),
        |sizes AS (SELECT unnest([100, 1000, 10000]) AS n_vocab)
        |SELECT CAST(s.n_vocab AS BIGINT) AS n_vocab,
        | CAST(sum(r.f) AS BIGINT) AS covered,
        | CAST(tot.tot_toks AS BIGINT) AS tot_toks,
        | CAST(sum(r.f) * 1000000 // tot.tot_toks AS BIGINT) AS coverage_ppm
        |FROM sizes s JOIN r ON r.rk <= s.n_vocab CROSS JOIN tot
        |GROUP BY s.n_vocab, tot.tot_toks""".stripMargin,

    "q237_vocab_growth" ->
      """WITH tok AS (
        | SELECT doc_id // 100 AS bucket,
        |  unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    x -> length(x) > 0)) AS w
        | FROM documents),
        |pb AS (SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY 1),
        |fw AS (SELECT min(bucket) AS fb FROM tok GROUP BY w),
        |nw AS (SELECT fb, count(*) AS new_words FROM fw GROUP BY 1)
        |SELECT bucket, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(coalesce(new_words, 0) AS BIGINT) AS new_words,
        | CAST(sum(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens,
        | CAST(sum(coalesce(new_words, 0)) OVER (ORDER BY bucket) AS BIGINT)
        |  AS cum_vocab
        |FROM pb LEFT JOIN nw ON nw.fb = pb.bucket""".stripMargin,

    // q263: positional postings via generate_subscripts/unnest (which
    // zip positionally), then the same adjacency self-joins.
    "q263_phrase_search" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |w AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
        |  unnest(l) AS term FROM d),
        |m AS (SELECT a.doc_id, a.pos AS start FROM w a
        | JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |   AND b.term = 'column'
        | JOIN w c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |   AND c.term = 'sort'
        | WHERE a.term = 'row')
        |SELECT doc_id, count(*) AS n_matches,
        |  CAST(min(start) AS BIGINT) AS first_pos
        |FROM m GROUP BY 1""".stripMargin,

    // q281: same prefix explode via generate_series, same window.
    "q281_autocomplete" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM tok
        | WHERE length(term) > 0 GROUP BY 1),
        |p AS (SELECT substr(term, 1, g.plen) AS prefix, term, cnt
        | FROM c JOIN range(1, 5) AS g(plen)
        |   ON g.plen <= least(4, length(term))),
        |r AS (SELECT prefix, term, cnt, row_number() OVER (
        |  PARTITION BY prefix ORDER BY cnt DESC, term) AS rank FROM p)
        |SELECT prefix, CAST(rank AS INT) AS rank, term, cnt
        |FROM r WHERE rank <= 3""".stripMargin,

    // q302: islands by running stopword count, word deg/freq census,
    // distinct-phrase scoring — the identical integer pipeline.
    "q302_rake" ->
      s"""WITH tk AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\\s+') AS t
        | FROM documents WHERE length(trim(text)) > 0),
        |pos AS (SELECT doc_id, i, t[i] AS w FROM tk,
        |  LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) ix),
        |m AS (SELECT doc_id, i, w,
        |  CASE WHEN w IN ($q302StopSql) THEN 1 ELSE 0 END AS st,
        |  sum(CASE WHEN w IN ($q302StopSql) THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY i) AS ph
        | FROM pos),
        |phr AS (SELECT doc_id, ph, list(w ORDER BY i) AS ws
        | FROM m WHERE st = 0 GROUP BY 1, 2
        | HAVING count(*) BETWEEN 1 AND 4),
        |wstat AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |  CAST(sum(l) AS BIGINT) AS deg
        | FROM (SELECT unnest(ws) AS w, len(ws) AS l FROM phr) GROUP BY 1),
        |wsc AS (SELECT w, deg * 1000000 // freq AS wscore FROM wstat),
        |pc AS (SELECT array_to_string(ws, ' ') AS phrase,
        |  CAST(count(*) AS BIGINT) AS n FROM phr GROUP BY 1),
        |pw AS (SELECT DISTINCT array_to_string(ws, ' ') AS phrase, ws
        | FROM phr),
        |psc AS (SELECT phrase, CAST(sum(wscore) AS BIGINT) AS score_e6
        | FROM (SELECT phrase, unnest(ws) AS w FROM pw)
        | JOIN wsc USING (w) GROUP BY 1)
        |SELECT pc.phrase, pc.n, psc.score_e6
        |FROM pc JOIN psc USING (phrase)
        |ORDER BY score_e6 DESC, phrase LIMIT 25""".stripMargin,

    // q379: head census → total-order rank → one pinned-ln OLS row.
    "q379_zipf_slope" ->
      """WITH tk AS (SELECT
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |u AS (SELECT unnest(t) AS w FROM tk),
        |c0 AS (SELECT w, count(*) AS c FROM u GROUP BY 1
        | ORDER BY c DESC, w LIMIT 1000),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
        | FROM c0),
        |p AS (SELECT
        |  CAST(round(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
        |  CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
        | FROM r),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT) * x) AS sxx,
        |  sum(CAST(x AS HUGEINT) * y) AS sxy FROM p),
        |s AS (SELECT n,
        |  CAST(CAST(sx AS DECIMAL(38,0)) AS VARCHAR) AS sx_s,
        |  CAST(CAST(sy AS DECIMAL(38,0)) AS VARCHAR) AS sy_s,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |   ELSE CAST((n * sxy - sx * sy) * 1000000
        |    // (n * sxx - sx * sx) AS BIGINT) END AS slope_e6,
        |  sx, sy FROM a)
        |SELECT n, sx_s AS sx, sy_s AS sy, slope_e6,
        | CASE WHEN slope_e6 IS NULL THEN NULL
        |  ELSE CAST((sy * 1000000 - CAST(slope_e6 AS HUGEINT) * sx)
        |   // 1000000 // n AS BIGINT) END AS intercept_e6
        |FROM s""".stripMargin,

    // q404: frequency band-pass significance set, sentence split with
    // aligned 0-based indices, struct-min argmax per doc.
    "q404_luhn_summary" ->
      """WITH wf AS (SELECT w, count(*) AS f FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(
        |   trim(lower(text)), '\s+'), x -> length(x) > 0)) AS w
        |  FROM documents) GROUP BY 1),
        |sig AS (SELECT w FROM wf WHERE f BETWEEN 10 AND 1000),
        |sa AS (SELECT doc_id,
        |  regexp_split_to_array(text, '\.') AS arr FROM documents),
        |sent AS (SELECT doc_id, i - 1 AS sidx,
        |  unnest(list_filter(regexp_split_to_array(
        |   trim(lower(arr[i])), '\s+'), x -> length(x) > 0)) AS w
        | FROM sa, LATERAL (SELECT unnest(
        |   generate_series(1, len(arr))) AS i) ix),
        |sc AS (SELECT doc_id, sidx,
        |  CAST(count(*) AS BIGINT) AS nwords,
        |  CAST(sum(CASE WHEN sig.w IS NOT NULL THEN 1 ELSE 0 END)
        |   AS BIGINT) AS nsig
        | FROM sent LEFT JOIN sig ON sig.w = sent.w
        | GROUP BY 1, 2),
        |sc2 AS (SELECT doc_id, sidx, nsig, nwords,
        |  nsig * nsig * 1000000 // nwords AS score FROM sc),
        |best AS (SELECT doc_id, min(struct_pack(ns := -score,
        |  sidx := CAST(sidx AS BIGINT), nsig := nsig,
        |  nw := nwords)) AS b
        | FROM sc2 GROUP BY 1)
        |SELECT doc_id, b.sidx AS best_sidx, b.nsig AS nsig,
        | b.nw AS nwords, -(b.ns) AS score_e6
        |FROM best""".stripMargin,

    // q426: train word census + add-one cost per TYPE (one pinned ln
    // chain), doc totals from (doc, word, k) cells, fixed-band histogram.
    "q426_ppl_filter" ->
      """WITH tr AS (SELECT
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        | FROM documents WHERE (doc_id // 20) % 5 < 4),
        |cen AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tr
        | GROUP BY 1),
        |sc AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS v FROM cen),
        |evt AS (SELECT doc_id, source AS g,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        | FROM documents WHERE (doc_id // 20) % 5 >= 4),
        |cells AS (SELECT doc_id, g, w, CAST(count(*) AS BIGINT) AS k
        | FROM evt GROUP BY 1, 2, 3),
        |costs AS (SELECT doc_id, g, k,
        |  CAST(round(-ln((CAST(coalesce(cen.c, 0) AS DOUBLE) + 1.0)
        |    / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))) * 1000000.0)
        |   AS BIGINT) AS cost
        | FROM cells LEFT JOIN cen USING (w), sc),
        |docs AS (SELECT g,
        |  CAST(sum(CAST(k AS HUGEINT) * cost) // sum(k) AS BIGINT)
        |   AS ppl,
        |  CAST(sum(k) AS BIGINT) AS nt
        | FROM costs GROUP BY doc_id, g)
        |SELECT g AS source, least(ppl // 500000, 20) AS band,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM docs GROUP BY 1, 2""".stripMargin,

    // q414: the full stylometric chain — top-30 word list, zero-filled
    // source/doc grids, cross-profile moments with the corrected
    // isqrt, toward-zero z, struct-min attribution.
    "q414_burrows_delta" ->
      """WITH toks AS (SELECT doc_id AS id, source AS g,
        |  unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |   '\s+'), x -> length(x) > 0)) AS w
        | FROM documents),
        |topw AS (SELECT w FROM (SELECT w, count(*) AS f FROM toks
        | GROUP BY 1 ORDER BY f DESC, w LIMIT 30)),
        |grp AS (SELECT DISTINCT g FROM toks),
        |gt AS (SELECT g, CAST(count(*) AS BIGINT) AS gt FROM toks
        | GROUP BY 1),
        |gc AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
        | FROM toks JOIN topw USING (w) GROUP BY 1, 2),
        |gg AS (SELECT grp.g, topw.w,
        |  coalesce(gc.c, 0) * 1000000000 // gt.gt AS rf
        | FROM grp CROSS JOIN topw
        | LEFT JOIN gc ON gc.g = grp.g AND gc.w = topw.w
        | JOIN gt ON gt.g = grp.g),
        |ws AS (SELECT w, CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(rf) AS BIGINT) AS srf,
        |  sum(CAST(rf AS HUGEINT) * rf) AS qrf FROM gg GROUP BY 1),
        |w2 AS (SELECT w, k, srf,
        |  k * qrf - CAST(srf AS HUGEINT) * srf AS var_num FROM ws),
        |w3 AS (SELECT w, k, srf,
        |  CAST(k AS HUGEINT) * var_num // (k - 1) AS v2 FROM w2),
        |w4 AS (SELECT w, k, srf, v2,
        |  CAST(floor(sqrt(CAST(v2 AS DOUBLE))) AS BIGINT) AS s0
        | FROM w3),
        |w5 AS (SELECT w, k, srf,
        |  CASE WHEN CAST(s0 AS HUGEINT) * s0 > v2 THEN s0 - 1
        |   WHEN (CAST(s0 AS HUGEINT) + 1) * (s0 + 1) <= v2 THEN s0 + 1
        |   ELSE s0 END AS den
        | FROM w4),
        |wok AS (SELECT * FROM w5 WHERE den > 0),
        |gz AS (SELECT gg.g, gg.w,
        |  CASE WHEN k * rf - srf >= 0
        |   THEN CAST((k * rf - srf) * 1000000 // den AS BIGINT)
        |   ELSE -CAST((-(k * rf - srf)) * 1000000 // den AS BIGINT)
        |  END AS zg
        | FROM gg JOIN wok ON wok.w = gg.w),
        |dt AS (SELECT id, g AS actual, CAST(count(*) AS BIGINT) AS dt
        | FROM toks GROUP BY 1, 2),
        |dc AS (SELECT id, w, CAST(count(*) AS BIGINT) AS c
        | FROM toks JOIN topw USING (w) GROUP BY 1, 2),
        |dg AS (SELECT dt.id, dt.actual, topw.w,
        |  coalesce(dc.c, 0) * 1000000000 // dt.dt AS rf
        | FROM dt CROSS JOIN topw
        | LEFT JOIN dc ON dc.id = dt.id AND dc.w = topw.w),
        |dz AS (SELECT dg.id, dg.actual, dg.w,
        |  CASE WHEN k * rf - srf >= 0
        |   THEN CAST((k * rf - srf) * 1000000 // den AS BIGINT)
        |   ELSE -CAST((-(k * rf - srf)) * 1000000 // den AS BIGINT)
        |  END AS zd
        | FROM dg JOIN wok ON wok.w = dg.w),
        |dl AS (SELECT dz.id, dz.actual, gz.g,
        |  CAST(count(*) AS BIGINT) AS nw,
        |  CAST(sum(abs(zd - zg)) AS BIGINT) AS sumabs
        | FROM dz JOIN gz ON gz.w = dz.w GROUP BY 1, 2, 3),
        |d2 AS (SELECT id, actual, g, nw, sumabs // nw AS delta
        | FROM dl),
        |best AS (SELECT id, actual, min(struct_pack(delta := delta,
        |  g := g, nw := nw)) AS b FROM d2 GROUP BY 1, 2)
        |SELECT id AS doc_id, actual, b.g AS best,
        | CAST(b.delta AS BIGINT) AS delta_e6,
        | actual = b.g AS is_correct, b.nw AS n_words_used
        |FROM best""".stripMargin,

    // q375: train-census vocab (count ≥ 2) probed by a census-to-census
    // left join; exact e6 token/type rates.
    "q375_oov_rate" ->
      """WITH tr AS (SELECT
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        | FROM documents WHERE doc_id % 10 < 8),
        |vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM tr
        |  GROUP BY 1) WHERE c >= 2),
        |ev AS (SELECT source AS g,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        | FROM documents WHERE doc_id % 10 >= 8),
        |cen AS (SELECT g, w, count(*) AS c FROM ev GROUP BY 1, 2),
        |j AS (SELECT cen.g, cen.c, vocab.w AS vw FROM cen
        | LEFT JOIN vocab ON vocab.w = cen.w),
        |a AS (SELECT g AS source, CAST(sum(c) AS BIGINT) AS tokens,
        |  CAST(count(*) AS BIGINT) AS types,
        |  CAST(sum(CASE WHEN vw IS NULL THEN c ELSE 0 END) AS BIGINT)
        |    AS oov_tokens,
        |  CAST(sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_types
        | FROM j GROUP BY 1)
        |SELECT source, tokens, types, oov_tokens, oov_types,
        | CASE WHEN tokens = 0 THEN NULL
        |  ELSE CAST(CAST(oov_tokens AS HUGEINT) * 1000000 // tokens
        |   AS BIGINT) END AS oov_rate_e6,
        | CASE WHEN types = 0 THEN NULL
        |  ELSE CAST(CAST(oov_types AS HUGEINT) * 1000000 // types
        |   AS BIGINT) END AS oov_type_rate_e6
        |FROM a""".stripMargin,

    // q371: identical pinned counting rules (list lambdas mirror the
    // Spark higher-order functions), HUGEINT-widened e3 formula.
    "q371_readability" ->
      """WITH d AS (SELECT source,
        |  list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |    w -> w <> '') AS t,
        |  greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    AS sents
        | FROM documents),
        |p AS (SELECT source, sents, len(t) AS words,
        |  CAST(coalesce(list_sum(list_transform(t, w ->
        |    greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0)
        |   AS BIGINT) AS syls
        | FROM d),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS words,
        |  CAST(sum(sents) AS BIGINT) AS sentences,
        |  CAST(sum(syls) AS BIGINT) AS syllables FROM p GROUP BY 1)
        |SELECT source, n_docs, words, sentences, syllables,
        | CAST(CAST(words AS HUGEINT) * 1000 // sentences AS BIGINT)
        |   AS wps_e3,
        | CASE WHEN words = 0 THEN NULL
        |  ELSE CAST(CAST(syllables AS HUGEINT) * 1000 // words
        |   AS BIGINT) END AS spw_e3,
        | CASE WHEN words = 0 THEN NULL
        |  ELSE CAST(206835
        |   - CAST(1015 AS HUGEINT) * words // sentences
        |   - CAST(84600 AS HUGEINT) * syllables // words AS BIGINT) END
        |  AS flesch_e3,
        | CASE WHEN words = 0 THEN NULL
        |  ELSE CAST(CAST(390 AS HUGEINT) * words // sentences
        |   + CAST(11800 AS HUGEINT) * syllables // words
        |   - 15590 AS BIGINT) END AS fk_grade_e3
        |FROM g""".stripMargin,

    // q372: the two offset pair sets via array indexing, the q125
    // three-ln chain, the 0 clamp, and the total-order top-30.
    "q372_ppmi_window" ->
      """WITH tk AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS t
        | FROM documents),
        |u AS (SELECT unnest(t) AS w FROM tk),
        |cu AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
        |n1 AS (SELECT count(*) AS c FROM u),
        |pr AS (
        | SELECT t[i] AS a, t[i+1] AS b FROM tk,
        |  LATERAL (SELECT unnest(generate_series(1, len(t)-1)) AS i) ix
        | WHERE len(t) >= 2
        | UNION ALL
        | SELECT t[i] AS a, t[i+2] AS b FROM tk,
        |  LATERAL (SELECT unnest(generate_series(1, len(t)-2)) AS i) iy
        | WHERE len(t) >= 3),
        |n2 AS (SELECT count(*) AS c FROM pr),
        |cb AS (SELECT a, b, count(*) AS c_ab FROM pr GROUP BY 1, 2
        |       HAVING count(*) >= 5)
        |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(ca.c AS BIGINT) AS c_a, CAST(cbb.c AS BIGINT) AS c_b,
        |  greatest(CAST(0 AS BIGINT),
        |   CAST(round((ln(CAST(c_ab AS DOUBLE) / CAST(n2.c AS DOUBLE))
        |    - ln(CAST(ca.c AS DOUBLE) / CAST(n1.c AS DOUBLE))
        |    - ln(CAST(cbb.c AS DOUBLE) / CAST(n1.c AS DOUBLE)))
        |   * 1000000.0) AS BIGINT)) AS ppmi_e6
        |FROM cb JOIN cu ca ON ca.w = cb.a JOIN cu cbb ON cbb.w = cb.b,
        |  n1, n2
        |ORDER BY ppmi_e6 DESC, a, b LIMIT 30""".stripMargin,

    // q323: the same one-row census (md5 hex matches across engines).
    "q323_data_card" ->
      """WITH d AS (SELECT source, lang, n_chars,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS toks,
        |  md5(text) AS fp
        | FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS docs,
        | CAST(count(DISTINCT source) AS BIGINT) AS sources,
        | CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | CAST(sum(toks) AS BIGINT) AS total_tokens,
        | CAST(count(DISTINCT fp) AS BIGINT) AS distinct_texts,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS en_docs,
        | CAST(min(toks) AS BIGINT) AS min_tokens,
        | CAST(max(toks) AS BIGINT) AS max_tokens,
        | CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*)
        |   AS BIGINT) AS dup_ppm,
        | CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
        |   // count(*) AS BIGINT) AS en_ppm,
        | CAST(sum(toks) * 100 // count(*) AS BIGINT) AS mean_tokens_e2
        |FROM d""".stripMargin,
  )
}
