package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-preparation operators for LLM training-data pipelines — the
  * steps between a cleaned document table and a tokenizer: split
  * assignment, sequence packing, PII scrubbing, train/test
  * decontamination, and distribution stats. All are declarative
  * `functions._` compositions (codegen'd, partial-aggregated, no UDFs).
  */
object CorpusOps {

  /** Deterministic hash-based split assignment: bucket = first two hex
    * chars of md5(id + salt), compared against hex boundaries. Hash
    * splits are the production norm because they are STABLE — a document
    * keeps its split when the corpus grows, across engines, and across
    * partitionings (no rand(), no row_number over an arbitrary order).
    *
    * `boundaries` are (label, upperBoundExclusive) in lowercase hex,
    * ascending; ids hashing >= the last bound get `defaultLabel`. The
    * default 00-0c/0d-19 split is ~5.1% test, ~5.1% val, ~89.8% train.
    * Embarrassingly parallel: one scan, no shuffle. */
  def splitAssign(df: DataFrame, idCol: String, salt: String,
      boundaries: Seq[(String, String)] = Seq("test" -> "0d", "val" -> "1a"),
      defaultLabel: String = "train"): DataFrame = {
    val bucket = substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 2)
    val split = boundaries.foldRight(lit(defaultLabel): Column) {
      case ((label, upper), rest) => when(bucket < upper, label).otherwise(rest)
    }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** EXACT-proportion stratified split — the complement of [[splitAssign]]:
    * hash splits are stable but only approximate proportions; evaluation
    * protocols often need per-stratum counts to be exact (e.g. exactly
    * 10% of EVERY language in val). Within each stratum, rows rank by
    * (PolyHash64(id), id) — content-independent, deterministic, engine-
    * reproducible — and the rank partitions by integer threshold
    * comparisons (`rn·W ≤ cum·n`), so each stratum's split sizes are
    * ⌊cum·n/W⌋-exact with no float boundaries.
    *
    * Shape: one shuffle on the stratum key, one window sort within it —
    * strata are assumed numerous (languages, sources, shards), so
    * per-stratum sort is bounded; a single giant stratum degrades to a
    * global sort and should be pre-sharded by the caller.
    *
    * Output: (idCol, stratumCol, split). */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    graft.functions.PolyHash64.register(df.sparkSession)
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0L)(_ + _._2).tail
    val h = graft.functions.PolyHash64.polyHash64(col(idCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    val wn = Window.partitionBy(col(stratumCol))
    val ranked = df.select(col(idCol), col(stratumCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
    val split = weights.zip(cum).init.foldRight(lit(weights.last._1): Column) {
      case (((label, _), c), rest) =>
        when(col("__rn") * total <= lit(c) * col("__n"), label).otherwise(rest)
    }
    ranked.select(col(idCol), col(stratumCol), split.as("split"))
  }

  /** Line-level boilerplate dedup (CCNet / RefinedWeb line-wise filtering
    * — public method: drop lines whose document frequency says "template",
    * keep the rest of the document intact). A line survives when fewer
    * than `maxDocFreq` DISTINCT documents contain it (empty/whitespace
    * lines always survive — they are structure, not content). Documents
    * whose every line is boilerplate drop out entirely, the
    * fully-templated-page case.
    *
    * Scale shape: explode lines (one narrow pass), ONE aggregation for
    * the df table keyed on the line text (map-side combined), an equi
    * join back, and an ordered reassembly grouped by doc — two shuffles
    * total, both on natural keys; no window over a global order. The df
    * table is vastly smaller than the corpus (distinct lines), and a
    * broadcast threshold picks the join strategy automatically.
    *
    * Output: (idCol, `text` rebuilt with `delim`). */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long, delim: String = "\n"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")))
    val df = lines.where(trim(col("__line")) =!= "")
      .groupBy(col("__line")).agg(countDistinct(col(idCol)).as("__df"))
    lines.join(df, Seq("__line"), "left")
      .where(col("__df").isNull || col("__df") < maxDocFreq)
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          e => e.getField("__line")),
        delim).as("text"))
  }

  /** Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better" §3 — the ExactSubstr pass corpora
    * pipelines pair with document-level MinHash): every k-token window
    * occurring at more than one (doc, position) keeps only its canonical
    * occurrence — the lowest (doc id, position) — and every other
    * occurrence's token span is CUT; each document reassembles from its
    * surviving tokens in order. Documents losing every token drop.
    * Overlapping duplicate spans union naturally (coverage is computed
    * per token).
    *
    * Plan: one window explode, ONE groupBy on the window text whose
    * canonical-occurrence min is a partial aggregation (a boilerplate
    * window in every doc combines map-side, the q55/SkewSpec discipline),
    * a join-back marking non-canonical spans (k marks per duplicated
    * occurrence, deduped), a left-anti token filter and a per-doc ordered
    * reassembly. All shuffle keys natural; no driver actions. At 100 TB,
    * group by xxhash64(window) and verify within the group to shrink the
    * shuffle width — same output; the string form keeps the DuckDB oracle
    * one-to-one (q57). */
  def exactSubstringDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"window size $k must be >= 2")
    val tok = docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("tk"))
    val win = tok.select(col("doc_id"), col("tk"),
        explode(when(size(col("tk")) >= k,
            sequence(lit(0), size(col("tk")) - k))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("doc_id"), col("p"),
        array_join(slice(col("tk"), col("p") + 1, lit(k)), " ").as("w"))
    val canon = win.groupBy("w").agg(
      min(struct(col("doc_id"), col("p"))).as("c"), count(lit(1)).as("n"))
    val marks = win.join(canon.where(col("n") > 1), "w")
      .where(!(col("doc_id") === col("c.doc_id") && col("p") === col("c.p")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + k - 1)).as("__ti"))
      .distinct()
    val tokens = tok.select(col("doc_id"),
      posexplode(col("tk")).as(Seq("__ti", "__t")))
    tokens.join(marks, Seq("doc_id", "__ti"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__ti"), col("__t")))),
          e => e.getField("__t")),
        " ").as("text"))
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining layout:
    * within each shard, documents concatenate into one token stream in
    * `idCol` order and the stream is cut every `budgetTokens`. Emits the
    * chunk each document STARTS in and its offset there.
    *
    * Sharding is what makes this scale: the running sum is a window per
    * shard, so the work distributes across shards instead of serializing
    * into one global ordered partition (pack order within a shard is
    * arbitrary-but-deterministic, which is all pretraining needs). Shard
    * by source/date/hash so no shard exceeds one task's memory. */
  def packSequences(docs: DataFrame, idCol: String, shardCol: String,
      tokenCountCol: Column, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(shardCol), tokenCountCol.cast("long").as("n_tokens"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        floor(col("start_off") / budgetTokens).cast("long").as("chunk_id"),
        (col("start_off") % budgetTokens).as("chunk_off"))
  }

  /** Hex bound for [[mixtureSample]]: keep a row when its 2-hex-char md5
    * bucket (0..255) sorts below this. Integer floor of pct·256/100 —
    * deterministic, slightly under-samples (≤ 1/256). */
  def pctHexBound(pct: Int): String =
    if (pct >= 100) "zz" // every hex bucket sorts below 'z'
    else f"${math.max(0, pct) * 256 / 100}%02x"

  /** Mixture resampling: keep each row iff its deterministic md5 bucket
    * sorts below a per-row hex bound (build bounds from per-source target
    * rates via [[pctHexBound]]). This is how pretraining mixtures
    * reweight sources — hash-gated, so the SAME documents are kept on
    * every run, engine, and partitioning, and a source's sample only
    * shrinks/grows at the margin when its weight changes (no rand(), no
    * per-source sorts). One scan, no shuffle. */
  def mixtureSample(df: DataFrame, idCol: String, salt: String,
      boundCol: Column): DataFrame =
    df.where(
      substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 2) < boundCol)

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling recipe (exponentiated counts, mT5/XLM-R style: share_s ∝
    * n_s^α with α < 1 upweighting small sources): per-source document
    * counts raise to α, normalize to parts-per-million shares, and cut a
    * document budget into per-source quotas. Feed the shares to
    * [[mixtureSample]]/[[weightedSample]] to materialize the draw.
    *
    * Scale: one map-side-combined count aggregate (sources are few);
    * everything after runs on the tiny source frame.
    *
    * Exactness: the single transcendental (pow) evaluates once per source
    * and rounds to integer micro-units immediately (the q72 rule); shares
    * and quotas are truncating integer divisions of LONG sums, so the
    * table hash-gates. Quotas sum to ≤ budget (truncation never
    * over-allocates). Range envelope: share_ppm's intermediate
    * `u_micro · 10^6` needs u_micro < 9.2e12, i.e. per-source counts
    * under ~10^9 at α=0.7 (10^16 at α=0.5) — beyond that, drop the micro
    * scaling to e3 at the call site. */
  def temperatureWeights(df: DataFrame, srcCol: String, alpha: Double,
      budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0 && budget > 0)
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("u_micro",
        round(pow(col("n_docs").cast("double"), lit(alpha)) * lit(1000000.0))
          .cast("long"))
    counts
      .withColumn("u_total",
        sum(col("u_micro")).over(Window.partitionBy()))
      .withColumn("share_ppm", expr("(u_micro * 1000000) div u_total"))
      .withColumn("quota", expr(s"(share_ppm * ${budget}L) div 1000000"))
      .select(col(srcCol), col("n_docs"), col("share_ppm"), col("quota"))
  }

  /** Largest-remainder (Hamilton) apportionment: cut an integer budget
    * into per-group quotas proportional to integer weights such that the
    * quotas sum to the budget EXACTLY — the fix for truncation drift
    * ([[temperatureWeights]] under-allocates by up to #groups−1 tokens,
    * which compounds when quotas feed downstream exact-count checks).
    * base_g = ⌊budget·w_g/W⌋, then the budget − Σbase leftover units go
    * to the largest fractional remainders (budget·w_g mod W), total-order
    * tie-break on the group key.
    *
    * All arithmetic is DECIMAL(38,0)·`div`/mod — budget·w never touches a
    * LONG, so 100 TB-scale token weights don't overflow. The post-agg
    * frame is one row per GROUP; the unpartitioned rank window over it is
    * deliberate and safe at any input scale (groups ≪ rows), same
    * contract as the KMV pair frame. */
  def apportion(df: DataFrame, keyCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0)
    val grouped = df.groupBy(col(keyCol))
      .agg(sum(col(weightCol)).cast("long").as("weight"))
    val tot = grouped.agg(sum(col("weight")).as("W"))
    val b = s"CAST($budget AS DECIMAL(38,0))"
    grouped.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"$b * weight div W"))
      .withColumn("rem",
        expr(s"CAST($b * weight - CAST(base AS DECIMAL(38,0)) * W AS BIGINT)"))
      .withColumn("deficit",
        lit(budget) - sum(col("base")).over(Window.partitionBy()))
      .withColumn("rk", row_number().over(
        Window.partitionBy(Census.onePartKey(col("rem"))).orderBy(col("rem").desc, col(keyCol))))
      .withColumn("quota",
        col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
      .select(col(keyCol), col("weight"), col("quota"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934): sample
    * sizes n_h ∝ N_h·S_h — variable strata earn proportionally more of
    * the budget than uniform-rate sampling would give them, minimizing
    * the stratified estimator's variance at fixed total cost.
    *
    * Exactness: N_h·S_h = √(N_h·Σy² − (Σy)²) exactly (the N_h² cancels
    * into the variance numerator), and the square root is an exact
    * integer isqrt — floor(√·) computed in double then CORRECTED by one
    * step in integer arithmetic, so the boundary cases where the IEEE
    * sqrt rounds across a perfect square cannot flip the floor. The
    * integer weights then feed [[apportion]], so quotas sum to the budget
    * exactly.
    *
    * Domain: N_h·Σy² must fit in a LONG — y should be modest integer
    * units (cents of a bounded metric), the callers' scaling contract.
    * Output: (strata, n_h, weight = ⌊N_h·S_h⌋, quota). */
  def neymanAllocation(df: DataFrame, strataCol: String, valueCol: String,
      budget: Long): DataFrame = {
    val y = col(valueCol).cast("long")
    val stats = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_h"), sum(y).as("sy"),
        sum(y * y).as("syy"))
      .withColumn("var_num", expr("n_h * syy - sy * sy"))
      .withColumn("s0",
        floor(sqrt(col("var_num").cast("double"))).cast("long"))
      .withColumn("w", expr(
        """CASE WHEN s0 * s0 > var_num THEN s0 - 1
          | WHEN (s0 + 1) * (s0 + 1) <= var_num THEN s0 + 1
          | ELSE s0 END""".stripMargin))
    val sizes = stats.select(col(strataCol).as("__k2"), col("n_h"))
    apportion(stats, strataCol, "w", budget)
      .join(broadcast(sizes), col(strataCol) === col("__k2"))
      .select(col(strataCol), col("n_h"), col("weight"), col("quota"))
  }

  /** Heaps-law vocabulary growth curve (Heaps 1978; Herdan 1960): how
    * many DISTINCT words the corpus has after each ingestion bucket —
    * the saturation diagnostic for "is more data still adding new
    * vocabulary", and the empirical V(n) ≈ K·n^β curve.
    *
    * Exactness: a word's first-occurrence bucket is a plain min, so
    * `cum_vocab` at bucket b = #words with first bucket ≤ b — exact
    * distinct counting without any sketch, and every point integer.
    *
    * Scale shape: the corpus collapses in TWO map-side-combinable
    * aggregates (per-bucket token counts; per-word min bucket →
    * per-bucket new-word counts); the cumulative windows then run over
    * the BUCKET axis — bounded by the bucketing the caller chose
    * (ingestion batches, days), never by corpus size. That bucketing is
    * the load-bearing contract: a per-document curve at 100 TB would put
    * the census on the wrong side of the plan. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      bucketSize: Long): DataFrame = {
    require(bucketSize >= 1)
    val tok = df.select(
        expr(s"$idCol div $bucketSize").as("bucket"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    val perBucket = tok.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val firsts = tok.groupBy(col("w"))
      .agg(min(col("bucket")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("new_words"))
    val w = Window.partitionBy(Census.onePartKey(col("bucket"))).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firsts, col("bucket") === col("fb"), "left")
      .withColumn("new_words", coalesce(col("new_words"), lit(0L)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("new_words")).over(w))
      .select(col("bucket"), col("n_tokens"), col("new_words"),
        col("cum_tokens"), col("cum_vocab"))
  }

  /** Weighted reservoir sampling without replacement (Efraimidis &
    * Spirakis 2006, algorithm A-ES): per group, keep the k items
    * maximizing u^(1/w) — each item's inclusion probability is then
    * proportional to its weight, the one-pass/mergeable classic for
    * "sample 10k docs per language, quality-weighted" jobs.
    *
    * Determinism discipline: u is not rand() but 53 bits of
    * [[graft.functions.PolyHash64]] of (id + salt) mapped into (0,1)
    * (low bit forced to 1 so ln never sees 0) — stable across runs,
    * partitionings, and engines, and replayable in the oracle's splitMix
    * chain. Priorities compare as ln(u)/w (the monotone transform of
    * u^(1/w)); only membership and rank are emitted, never the double.
    *
    * Scale shape: one scan; the per-group top-k ranked window pushes a
    * partial top-k below the exchange (WindowGroupLimit), so the shuffle
    * carries ~k rows per group, not the corpus. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, salt: String, k: Int): DataFrame = {
    require(k >= 1)
    graft.functions.PolyHash64.register(df.sparkSession)
    val h = graft.functions.PolyHash64.polyHash64(
      concat(col(idCol).cast("string"), lit(salt)))
    val bits = shiftright(h, 11).bitwiseAND(lit((1L << 53) - 1L))
      .bitwiseOR(lit(1L))
    val u = bits.cast("double") / lit(9007199254740992.0) // 2^53
    val priority = log(u) / col(weightCol).cast("double")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(priority.desc, col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(groupCol), col(idCol), col(weightCol), col("rn"))
  }

  /** Regex subset treated identically by Java's engine and RE2 (no
    * backrefs, no lookaround) — the patterns must behave the same in
    * Spark and in any RE2-based engine sharing the corpus. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ \\t\\n\\r]+"
  // Deliberate precision-over-recall: requires a leading '+', so
  // international-format numbers redact and domestic-format runs pass
  // through (bare 8+ digit runs collide with ids, prices, timestamps).
  // This is a detector floor, not complete PII coverage.
  val phonePattern = "\\+[0-9][0-9 ]{7,}[0-9]"

  /** PII detection + redaction: per-document match counts and the text
    * with emails/URLs/phones replaced by typed placeholders. Order
    * matters: emails first (URLs never contain a bare local@domain once
    * schemes are stripped), then URLs, then phone runs. One scan, no
    * shuffle, codegen'd. */
  def piiScrub(df: DataFrame, textCol: Column): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(textCol, lit(emailPattern), lit("<EMAIL>")),
        lit(urlPattern), lit("<URL>")),
      lit(phonePattern), lit("<PHONE>"))
    df
      .withColumn("n_emails",
        size(regexp_extract_all(textCol, lit(emailPattern), lit(0))).cast("long"))
      .withColumn("n_urls",
        size(regexp_extract_all(textCol, lit(urlPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(textCol, lit(phonePattern), lit(0))).cast("long"))
      .withColumn("redacted", redacted)
  }

  /** Sliding-window document chunking — the embedding/RAG ingestion
    * primitive: cut each document's token stream into windows of `window`
    * tokens advancing by `stride` (overlap = window − stride), plus a
    * tail-aligned final window so the document's end is always covered at
    * full width (the LangChain/retrieval-chunker convention; without it
    * the last ≤stride tokens would only appear in a runt or not at all).
    *
    * Pure narrow op: one tokenize + one explode per document, zero
    * shuffles — chunk count per doc is ⌈(len−window)/stride⌉+1, so output
    * scales linearly and partitioning is inherited from the scan. The
    * chunk key is the 1-based token start offset (deterministic; no
    * row_number, no sort).
    *
    * Output: (idCol, start, n_tokens, chunk). Documents shorter than
    * `window` produce exactly one chunk at start 1. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    val ts = split(trim(lower(col(textCol))), "\\s+")
    val lastStart = greatest(size(ts) - (window - 1), lit(1))
    val starts = array_distinct(concat(
      sequence(lit(1), lastStart, lit(stride)), array(lastStart)))
    docs
      .select(col(idCol), ts.as("toks"), explode(starts).as("start"))
      .select(col(idCol), col("start").cast("long").as("start"),
        size(slice(col("toks"), col("start"), lit(window))).cast("long")
          .as("n_tokens"),
        array_join(slice(col("toks"), col("start"), lit(window)), " ")
          .as("chunk"))
  }

  /** Raw lowercase word n-grams per document: (id, g), repeats included —
    * one narrow scan+explode, no shuffle. Documents shorter than n words
    * produce no rows. */
  def wordNgramsRaw(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // tokenize ONCE into a projected column: inlining the split into
    // every size/sequence/slice reference re-ran the regex per lambda
    // element (measured 4.7 s for a 1.5 MB corpus; this shape is ~8×)
    val toks = docs.select(col(idCol),
      split(trim(lower(col(textCol))), "\\s+").as("__ts"))
    if (n == 1) toks.select(col(idCol), explode(col("__ts")).as("g"))
    else toks.select(col(idCol),
      explode(when(size(col("__ts")) >= n,
          transform(sequence(lit(1), size(col("__ts")) - (n - 1)),
            i => array_join(slice(col("__ts"), i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("g"))
  }

  /** Content-defined chunking (the LBFS/rsync boundary rule, lifted to
    * tokens): a chunk boundary falls AFTER every token whose PolyHash64
    * is ≡ 0 (mod `boundaryMod`) — boundaries depend only on local
    * content, so an insertion re-chunks O(1) chunks instead of shifting
    * every downstream boundary the way fixed-stride chunking does. The
    * byte-dedup/storage shape of corpus management: identical passages
    * yield identical chunk fingerprints wherever they appear.
    *
    * One narrow scan: posexplode → codegen'd per-token hash → a per-doc
    * cumulative window assigns chunk ids → per-(doc, chunk) ordered
    * reassembly (sort_array over (pos, token) structs — deterministic,
    * no collect_list order reliance) → PolyHash64 fingerprint of the
    * chunk text. Expected chunk length ≈ boundaryMod tokens. Output:
    * (idCol, chunk_idx, n_tokens, fp). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      boundaryMod: Int): DataFrame = {
    require(boundaryMod >= 2)
    graft.functions.PolyHash64.register(docs.sparkSession)
    val toks = docs.select(col(idCol),
      posexplode(split(trim(lower(col(textCol))), "\\s+"))
        .as(Seq("pos", "tok")))
    val boundary = (graft.functions.PolyHash64.polyHash64(col("tok"))
      % boundaryMod === 0).cast("int")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk_idx",
        coalesce(sum(boundary).over(w), lit(0L)).cast("long"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("__parts"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__parts")).cast("long").as("n_tokens"),
        graft.functions.PolyHash64.polyHash64(
          array_join(transform(col("__parts"), p => p.getField("tok")), " "))
          .as("fp"))
  }

  /** Token frequency-of-frequencies census (the Zipf/Good–Turing spectrum
    * N_c = |{terms occurring exactly c times}|): the two-stage aggregation
    * over raw corpus tokens. N_1 (hapax count) estimates unseen-vocabulary
    * mass, the spectrum's tail shape is the Zipf diagnostic, and the
    * whole table is what smoothing estimators (Good–Turing) consume —
    * the vocabulary-health report of a training corpus.
    *
    * Scale: stage 1 shuffles per-term partial counts (map-side combine —
    * the exchange carries |vocab| rows, not |tokens|); stage 2 re-keys
    * that frame by count, collapsing to at most |distinct counts| rows
    * (≤ a few thousand even at corpus scale, Zipf guarantees it). No
    * sort, no distinct over raw tokens. Output: (cnt, n_terms). */
  def frequencySpectrum(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    wordNgramsRaw(docs, idCol, textCol, 1)
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_terms"))

  /** Distinct-n diversity profile (Li et al. 2016's distinct-1/-2,
    * the generation-diversity metric turned corpus readout): per group
    * and n ∈ 1..maxN, total word n-grams, distinct word n-grams, and
    * distinct_e6 = distinct·1e6 div total — low values flag templated
    * or repetition-heavy sources before they reach training. N-grams
    * are built PER DOCUMENT (never spanning docs), the [[wordNgramsRaw]]
    * tokenization verbatim.
    *
    * Scale shape: one tokenize+explode pass per n (narrow, no shuffle),
    * then a per-group count-distinct — the gram exchange is the
    * irreducible cost of exact distinctness and is map-side partially
    * aggregated; output is (group × maxN) census grain. */
  def distinctNgramProfileE6(docs: DataFrame, groupCol: String,
      textCol: String, maxN: Int): DataFrame = {
    require(maxN >= 1 && maxN <= 5,
      s"distinctNgramProfileE6: 1 ≤ maxN ≤ 5, got $maxN")
    val toks = docs.select(col(groupCol).as("grp"),
      split(trim(lower(col(textCol))), "\\s+").as("__ts"))
    (1 to maxN).map { n =>
      val grams =
        if (n == 1) toks.select(col("grp"), explode(col("__ts")).as("g"))
        else toks.select(col("grp"),
          explode(when(size(col("__ts")) >= n,
              transform(sequence(lit(1), size(col("__ts")) - (n - 1)),
                i => array_join(slice(col("__ts"), i, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("g"))
      grams.groupBy(col("grp"))
        .agg(count(lit(1)).as("total_grams"),
          countDistinct(col("g")).as("distinct_grams"))
        .select(col("grp"), lit(n.toLong).as("n"), col("total_grams"),
          col("distinct_grams"),
          expr("CAST(CAST(distinct_grams AS DECIMAL(38,0)) * 1000000" +
            " div total_grams AS BIGINT)").as("distinct_e6"))
    }.reduce(_ unionByName _)
  }

  /** Distinct lowercase word n-grams per document: (id, g). The distinct
    * is a full exchange of every gram — fine for small held-out sets,
    * wrong for a training corpus (see [[contamination]], which joins the
    * raw grams instead). */
  def wordNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    wordNgramsRaw(docs, idCol, textCol, n).distinct()

  /** Train/test decontamination scan (the public eval-hygiene step, e.g.
    * GPT-3 appendix C / PaLM §6): find training documents sharing any
    * word n-gram with a held-out set. Returns one row per contaminated
    * training doc with the shared-gram and test-doc counts — the frame a
    * pipeline anti-joins against before tokenizing.
    *
    * Scale: held-out sets are tiny next to the corpus, so the test gram
    * set dedupes (it's small) and broadcasts; the training side joins its
    * RAW exploded grams — the broadcast hash join filters map-side, so
    * only grams that actually hit the test set ever reach a shuffle, and
    * the final countDistinct dedupes per-doc repeats. (A train-side
    * pre-distinct would exchange the entire corpus's grams — the 100 TB
    * killer — for dedup the aggregation does anyway.) For gram-heavy
    * variants swap the string gram for xxhash64(g) on both sides (counts
    * are then hash-distinct; collisions ~n²/2⁶⁴). */
  def contamination(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val tr = wordNgramsRaw(train, idCol, textCol, n)
    val te = wordNgrams(test, idCol, textCol, n)
      .withColumnRenamed(idCol, "__test_id")
    tr.join(broadcast(te), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("__test_id")).as("n_test_docs"))
  }

  /** Exact discrete quantiles (the value at rank ⌈p·n/100⌉) per group via
    * a value histogram: groupBy (group, value) with partial aggregation,
    * then a cumulative window over the DISTINCT values only. That is the
    * shape that survives low-cardinality groups at 100 TB — the window
    * runs over |distinct values| rows per group (thousands), not |rows|
    * (billions); a row-level rank window would funnel entire groups
    * through single tasks. `percentiles` are integer percents. */
  def discQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[Int]): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist.withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
    // value at rank k=⌈p·n/100⌉ = min value whose cum ≥ k; integer cum
    // makes cum ≥ pn/100 ⇔ 100·cum ≥ p·n (no floats, no interpolation)
    val aggs = max(col("__n")).as("n_rows") +:
      percentiles.map(p =>
        min(when(col("__cum") * 100 >= col("__n") * p, col(valueCol)))
          .as(s"p$p"))
    withCum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** WEIGHTED discrete quantiles — [[discQuantiles]] with a mass column
    * (importance weights, token counts, revenue): the p-th weighted
    * quantile is the smallest value whose cumulative weight reaches
    * p% of the group's total, exactly — cum·100 ≥ W·p on DECIMAL(38,0)
    * integers (weights can be planet-scale sums; LONG·100 is not safe
    * at 100 TB). Same bounded-VALUE-domain contract as discQuantiles
    * (the census shuffles one row per distinct (group, value)); rows
    * with non-positive weight carry no mass and are dropped. */
  /** Effective sample size of an importance-weighted frame (Kish 1965;
    * the standard IS diagnostic): ESS = (Σw)²/Σw² — how many UNWEIGHTED
    * samples the weighted set is worth; ESS ≪ n flags weight collapse
    * (a handful of rows carrying all the mass — the failure mode of
    * aggressive importance sampling / DSIR reweighting). Exact:
    * DECIMAL(38,0) sums, ess_e6 = (Σw)²·1e6 div Σw²; one hash
    * aggregate, rows with non-positive weight carry nothing.
    * Domain contract: (Σw)²·1e6 must fit DECIMAL(38,0) — Σw ≤ ~5.6e15
    * per group. ESS is scale-invariant in w, so callers past that just
    * downscale the weights first.
    * Output: (group, n, sum_w, sum_w2, ess_e6, ess_per_n_e6). */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame =
    df.where(col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(weightCol).cast("decimal(38,0)")).as("sum_w"),
        sum(expr(s"CAST($weightCol AS DECIMAL(38,0)) * $weightCol"))
          .as("sum_w2"))
      .select(col(groupCol), col("n"), col("sum_w"), col("sum_w2"),
        expr("CAST(sum_w * sum_w * 1000000 div sum_w2 AS BIGINT)")
          .as("ess_e6"),
        expr("CAST(sum_w * sum_w * 1000000 div sum_w2 div n AS BIGINT)")
          .as("ess_per_n_e6"))

  def weightedDiscQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String,
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100))
    val hist = df.where(col(weightCol) > 0)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol)).as("__w"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = hist.withColumn("__cum", sum(col("__w")).over(cumW))
      .withColumn("__tw",
        sum(col("__w")).over(Window.partitionBy(col(groupCol))))
    val aggs = max(col("__tw")).as("total_weight") +:
      percentiles.map(p =>
        min(when(expr(s"CAST(__cum AS DECIMAL(38,0)) * 100" +
            s" >= CAST(__tw AS DECIMAL(38,0)) * $p"), col(valueCol)))
          .as(s"p$p"))
    withCum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Zipf-law slope of the corpus rank–frequency curve — the one-number
    * vocabulary-health summary next to the q115 spectrum (natural text
    * sits near −1; a pipeline bug, boilerplate flood, or synthetic
    * collapse bends it): exact integer OLS of ln(freq) on ln(rank) over
    * the top `topK` words by (count DESC, word) — the standard head fit
    * (the spectrum tail is the Good–Turing regime, not Zipf's).
    *
    * Pinned arithmetic: x = round(ln(rank)·1e6), y = round(ln(c)·1e6)
    * (one ln chain each), every OLS sum in DECIMAL(38,0),
    *
    *   slope_e6     = (n·Σxy − Σx·Σy)·1e6 div (n·Σxx − (Σx)²)
    *   intercept_e6 = (Σy·1e6 − slope_e6·Σx) div 1000000 div n
    *
    * (two-stage truncation on the intercept, documented). NULL when
    * fewer than 2 distinct ranks survive.
    *
    * Shape: one token pass to the word census, TakeOrderedAndProject
    * for the top-k head (no global sort), ranks by a window over the
    * k-row head (bounded by construction), scalar OLS on one row. */
  def zipfSlopeE6(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 1000): DataFrame = {
    require(topK >= 2)
    import org.apache.spark.sql.expressions.Window
    val census = wordNgramsRaw(docs, idCol, textCol, 1)
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(topK)
    val ranked = census.withColumn("r",
      row_number().over(Window.partitionBy(Census.onePartKey(col("c"))).orderBy(col("c").desc, col("g"))))
    val pts = ranked.select(
      round(log(col("r").cast("double")) * lit(1000000.0)).cast("long")
        .as("x"),
      round(log(col("c").cast("double")) * lit(1000000.0)).cast("long")
        .as("y"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    pts.agg(count(lit(1)).as("n"),
        sum(d(col("x"))).cast("decimal(38,0)").as("sx"),
        sum(d(col("y"))).cast("decimal(38,0)").as("sy"),
        sum(d(col("x")) * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(d(col("x")) * col("y")).cast("decimal(38,0)").as("sxy"))
      .withColumn("slope_e6", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - sx * sx = 0
          |   THEN NULL
          | ELSE CAST((CAST(n AS DECIMAL(38,0)) * sxy - sx * sy)
          |    * 1000000
          |   div (CAST(n AS DECIMAL(38,0)) * sxx - sx * sx)
          |  AS BIGINT) END""".stripMargin))
      .withColumn("intercept_e6", expr(
        """CASE WHEN slope_e6 IS NULL THEN NULL
          | ELSE CAST((sy * 1000000 - CAST(slope_e6 AS DECIMAL(38,0))
          |    * sx) div 1000000 div n AS BIGINT) END""".stripMargin))
      .select(col("n"), col("sx"), col("sy"), col("slope_e6"),
        col("intercept_e6"))
  }

  /** Out-of-vocabulary rate of an eval corpus under a train-derived
    * vocabulary — the tokenizer/coverage audit run before freezing a
    * vocab (a source whose OOV rate spikes is about to be butchered
    * into bytes). Vocabulary = train tokens with count ≥ `minCount`
    * (the standard rare-word floor); per eval group both the TOKEN
    * rate (mass that falls out) and the TYPE rate (distinct words that
    * fall out) in exact truncating e6.
    *
    * Shape: both corpora collapse to word-grain censuses first (the
    * only raw-data passes); the membership probe is a census-to-census
    * left join on the word key — token grain never shuffles, and no
    * broadcast assumption is made about vocabulary size. */
  def oovRate(train: DataFrame, eval: DataFrame, textCol: String,
      groupCol: String, minCount: Long): DataFrame = {
    def toks(df: DataFrame, extra: Seq[Column]) = df.select(extra :+
      explode(split(trim(lower(col(textCol))), "\\s+")).as("w"): _*)
    val vocab = toks(train, Seq.empty)
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select(col("w"), lit(1L).as("__in"))
    val ev = toks(eval, Seq(col(groupCol).as("group")))
      .groupBy(col("group"), col("w")).agg(count(lit(1)).as("c"))
    ev.join(vocab, Seq("w"), "left")
      .groupBy(col("group"))
      .agg(sum(col("c")).as("tokens"),
        count(lit(1)).as("types"),
        sum(when(col("__in").isNull, col("c")).otherwise(0L))
          .as("oov_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov_types"))
      .withColumn("oov_rate_e6", expr(
        """CASE WHEN tokens = 0 THEN NULL
          | ELSE CAST(CAST(oov_tokens AS DECIMAL(38,0)) * 1000000
          |   div tokens AS BIGINT) END""".stripMargin))
      .withColumn("oov_type_rate_e6", expr(
        """CASE WHEN types = 0 THEN NULL
          | ELSE CAST(CAST(oov_types AS DECIMAL(38,0)) * 1000000
          |   div types AS BIGINT) END""".stripMargin))
  }

  /** CCNet-style perplexity-filter audit (Wenzek et al. 2020): held-out
    * docs scored by MEAN PER-TOKEN COST under a train-split unigram LM
    * with add-one smoothing (OOV words get the +1 floor mass), bucketed
    * into fixed-width nat bands per group — the head/middle/tail
    * histogram a quality-filtering pass cuts on. CCNet's terciles would
    * need a data-grain quantile; FIXED bands keep the output at
    * (group × band) census grain at any scale.
    *
    * Pinned arithmetic: per word TYPE,
    *   cost_e6 = round(−ln((c+1)/(N+V))·1e6)   — ONE double chain
    * (the q374 rule); per doc, total = Σ k·cost_e6 over its (word, k)
    * cells; ppl_e6 = total div n_tokens (mean micro-nats, truncating);
    * band = least(ppl_e6 div bandNatsE6, maxBand).
    *
    * Shape: train collapses once to a word census (persisted — the
    * scalar totals and the probe join both read it; lives until the
    * caller's clearCache, the collocations contract); held-out docs
    * collapse to (doc, word) cells; the probe is a census-to-census
    * LEFT join; the doc aggregate and the (group, band) histogram are
    * hash aggregates. Nothing sorts at data grain. */
  def pplFilterBands(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, groupCol: String, bandNatsE6: Long,
      maxBand: Long): DataFrame = {
    require(bandNatsE6 > 0L && maxBand >= 1L)
    val census = train
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scal = broadcast(census.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      count(lit(1)).as("v")))
    val cells = eval.select(col(idCol).as("id"), col(groupCol).as("g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .groupBy(col("id"), col("g"), col("w"))
      .agg(count(lit(1)).as("k"))
    val costs = cells.join(census, Seq("w"), "left").crossJoin(scal)
      .select(col("id"), col("g"), col("k"),
        round(-log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0))
            / (col("n").cast("double") + col("v").cast("double")))
          * lit(1000000.0)).cast("long").as("cost_e6"))
    costs.groupBy(col("id"), col("g"))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k").cast("decimal(38,0)") * col("cost_e6")).as("total"))
      .select(col("g").as("group"),
        least(expr(s"CAST(total div n_tokens AS BIGINT) div $bandNatsE6"),
          lit(maxBand)).as("band"),
        col("n_tokens"))
      .groupBy(col("group"), col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }
}

