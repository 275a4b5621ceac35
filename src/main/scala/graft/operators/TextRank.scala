package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 relevance ranking (Robertson–Spärck Jones; the Okapi BM25 used by
  * Lucene/Elasticsearch, idf = ln(1 + (N − df + 0.5)/(df + 0.5))) — the
  * retrieval scorer a training-data pipeline runs to mine query-relevant
  * documents from a crawl.
  *
  * Scale shape: one tokenize pass feeds BOTH the doc-length frame and the
  * term-frequency frame; df and the global (N, Σdl) stats are tiny
  * aggregates broadcast back; the only full-data shuffle is the per-doc
  * tf groupBy on bounded keys (|terms| ≤ a few dozen rows per doc).
  *
  * Exactness discipline (the q01/q70 rule — never hash-gate a raw double
  * SUM): each per-term contribution is computed as a double in ONE pinned
  * operation order — ln and divisions on values derived from integer
  * tf/df/dl — then scaled to integer micro-units and rounded; the per-doc
  * score is a LONG sum of those, order-independent and replayable. The
  * single transcendental (ln) is evaluated on ≤|terms| distinct inputs by
  * both engines' libm; a last-ulp divergence would need to move a product
  * within 5e-7 of a rounding boundary to flip a gate bit.
  */
object TextRank {

  /** Per-document BM25 over a fixed term set. Output: (idCol,
    * terms_matched, score_e6, rank) for documents matching ≥1 term; rank
    * is total-ordered (score desc, id asc — the deterministic tie-break).
    * `k1`/`b` are the standard free parameters (1.2 / 0.75). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty)
    // ONE corpus pass: doc length comes from size(split) with no explode,
    // and only QUERY-TERM tokens survive into the exploded frame — the
    // persisted `base` carries two longs plus matched terms per doc, so
    // at 100 TB the scan runs once and nothing corpus-sized is cached.
    val base = docs
      .select(col(idCol).as("id"),
        split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .select(col("id"), size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => t.isin(terms.map(lit): _*)).as("qtoks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = base.select(col("id"), col("dl"))
    val g = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base.select(col("id"), explode(col("qtoks")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // Pinned double pipeline (mirrored literally in the q72 oracle):
    //   avgdl = double(sum_dl) / double(n_docs)
    //   norm  = (1 − b) + b · (double(dl) / avgdl)
    //   idf   = ln(1 + ((n_docs − df) + 0.5) / (df + 0.5))
    //   c_e6  = round(idf · ((double(tf) · (k1+1)) / (double(tf) + k1·norm)) · 1e6)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = round(idf *
      ((col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") + lit(k1) * norm)) * lit(1000000.0))
      .cast("long")

    val scored = tf.join(broadcast(df), "tok").join(dl, "id")
      .crossJoin(broadcast(g))
      .select(col("id"), contrib.as("c_e6"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("terms_matched"), sum(col("c_e6")).as("score_e6"))
    // Global rank WITHOUT the single-reducer row_number window (at
    // corpus scale "all matched docs" is the corpus): GlobalRank's
    // range-repartitioned two-pass numbering under the same total order.
    // GlobalRank returns an eager localCheckpoint, so `base` is done.
    val ranked = GlobalRank.withGlobalRowNumber(scored,
      Seq(col("score_e6").desc, col("id")), "rank")
    base.unpersist()
    ranked.select(col("id").as(idCol), col("terms_matched"),
      col("score_e6"), col("rank"))
  }

  /** Per-document top-`topK` keyword extraction by tf/df salience — the
    * classic tf-idf ranking with the idf dampening replaced by an exact
    * integer ratio: score_e6 = ⌊tf·10⁶ / df⌋ (df = number of documents
    * containing the term), so corpus-wide stopwords (huge df) sink and
    * document-distinctive repeats rise, and every comparison is integer —
    * bit-replayable by any engine, no log() ulp drift.
    *
    * Shape: tf is one (doc, term) aggregation of the exploded scan; df is
    * a second aggregation OF THE TF FRAME (already one row per doc-term —
    * never re-touches raw tokens); the per-doc top-k rides a rank-window
    * whose `rk <= topK` predicate Catalyst rewrites to WindowGroupLimit,
    * pushing the limit into partial per-partition top-k heaps BEFORE the
    * exchange (the q98 plan shape). Ties break (score desc, term asc) —
    * total order. Output: (idCol, term, tf, df, score_e6, rk). */
  def tfDfKeywords(docs: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be >= 1")
    val toks = docs.select(col(idCol).as("id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfr, "term")
      .withColumn("score_e6", expr("tf * 1000000 div df"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score_e6").desc, col("term"))).cast("long"))
      .where(col("rk") <= topK)
      .select(col("id").as(idCol), col("term"), col("tf"), col("df"),
        col("score_e6"), col("rk"))
  }

  /** Collocation discovery by pointwise mutual information — the corpus
    * phrase-mining step (Church & Hanks 1990): adjacent token pairs
    * whose co-occurrence beats chance, PMI = ln(p(a,b)/(p(a)p(b))),
    * with a minimum-count floor (raw PMI is a rare-pair magnet — the
    * floor is the standard fix).
    *
    * Determinism: PMI evaluates as the pinned three-ln chain
    * ln(c_ab/N₂) − ln(c_a/N₁) − ln(c_b/N₁) rounded to micro-nats — the
    * same double-pipeline discipline as BM25/bigram-LM, replayed by the
    * oracle. Shape: unigram and bigram censuses are two map-side-combined
    * aggregations of narrow exploded scans; the minCount filter shrinks
    * the bigram side BEFORE its two term joins, and the final top-k is
    * TakeOrderedAndProject (no global sort materializes). Output:
    * (a, b, c_ab, c_a, c_b, pmi_e6), top `topK` by (pmi desc, a, b). */
  /** Windowed PPMI co-occurrence — the skip-gram statistic word-vector
    * training factorizes (Levy & Goldberg 2014: SGNS ≈ shifted-PPMI
    * factorization): directed (word, context) pairs for contexts 1 and
    * 2 positions to the right, PMI by the q125-pinned three-ln chain
    * against the unigram census, clamped at 0 (POSITIVE pointwise
    * mutual information), min-count floor against the rare-pair
    * magnet, top-k with a total (ppmi desc, a, b) order.
    *
    * Shape: pairs are built INSIDE each row's token array (the
    * wordNgramsRaw pattern — one codegen'd transform per offset, no
    * token-grain shuffle, no window, no self-join), so nothing moves
    * until the pair/unigram censuses reduce map-side; the two corpus
    * totals ride a broadcast one-row frame. The final top-k is
    * TakeOrderedAndProject over the (bounded) surviving pair census.
    * Persisted censuses live until the caller's clearCache (the
    * collocations contract). */
  def ppmiWindow(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val toks = docs.select(
      split(trim(lower(col(textCol))), "\\s+").as("__ts"))
    def offsetPairs(off: Int): DataFrame = toks.select(
      explode(when(size(col("__ts")) >= off + 1,
          transform(sequence(lit(1), size(col("__ts")) - off), i =>
            struct(element_at(col("__ts"), i).as("a"),
              element_at(col("__ts"), i + off).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>")))
        .as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
    val uni = toks.select(explode(col("__ts")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = offsetPairs(1).unionByName(offsetPairs(2))
    val pairCensus = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = broadcast(uni.agg(coalesce(sum(col("c")), lit(0L)).as("__n1"))
      .crossJoin(pairCensus.agg(
        coalesce(sum(col("c_ab")), lit(0L)).as("__n2"))))
    pairCensus.where(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
      .crossJoin(totals)
      .withColumn("ppmi_e6", greatest(lit(0L), round((
        log(col("c_ab").cast("double") / col("__n2").cast("double")) -
        log(col("c_a").cast("double") / col("__n1").cast("double")) -
        log(col("c_b").cast("double") / col("__n1").cast("double"))) *
        lit(1000000.0)).cast("long")))
      .orderBy(col("ppmi_e6").desc, col("a"), col("b"))
      .limit(topK)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("ppmi_e6"))
  }

  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    // one explode scan per n-gram order; totals derive from the (small)
    // persisted censuses, never from a second pass over raw tokens
    val uni = CorpusOps.wordNgramsRaw(docs, idCol, textCol, 1)
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val biAll = CorpusOps.wordNgramsRaw(docs, idCol, textCol, 2)
      .groupBy(col("g")).agg(count(lit(1)).as("c_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = uni.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val n2 = biAll.agg(coalesce(sum(col("c_ab")), lit(0L))).head().getLong(0)
    val bi = biAll.where(col("c_ab") >= minCount)
      .select(element_at(split(col("g"), " "), 1).as("a"),
        element_at(split(col("g"), " "), 2).as("b"), col("c_ab"))
    val pmi = round((
      log(col("c_ab").cast("double") / lit(n2.toDouble)) -
      log(col("c_a").cast("double") / lit(n1.toDouble)) -
      log(col("c_b").cast("double") / lit(n1.toDouble))) * lit(1000000.0))
      .cast("long")
    bi
      .join(uni.select(col("g").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("g").as("b"), col("c").as("c_b")), "b")
      .withColumn("pmi_e6", pmi)
      .orderBy(col("pmi_e6").desc, col("a"), col("b"))
      .limit(topK)
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_e6"))
  }

  /** All-pairs cosine over SPARSE tf-idf vectors — the weighted-vector
    * complement to the Jaccard/PPJoin set family (near-dup on sets,
    * topical similarity on weights): documents pair through an inverted
    * index on their SHARED terms only, never through a dense d×d or
    * n×n product.
    *
    * Exactness: weights are integer milli-units (w = tf·1000 div df —
    * the [[tfDfKeywords]] salience, df-damped), dots and norms are
    * exact integer sums, and only the final cosine touches doubles in
    * the q20-pinned single order (dot / √(na·nb), e6-rounded).
    *
    * Scale discipline: the df prune `2 ≤ df ≤ maxDf` is load-bearing,
    * not cosmetic — a term appearing in df docs contributes O(df²)
    * candidate pairs, so maxDf CAPS the posting-list blowup exactly
    * like the PPJoin prefix filter; df=1 terms pair with nothing and
    * drop. Vectors live in the pruned term space (norms computed over
    * surviving terms), which is also what production tf-idf systems do
    * (stopword ceiling + hapax floor). Output pairs with
    * cos_e6 ≥ minCosE6: (a_id, b_id, dot, na2, nb2, cos_e6). */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, minCosE6: Long): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf must be >= 2")
    val toks = docs.select(col(idCol).as("id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf)
    val w = tf.join(dfr, "term")
      .withColumn("w", expr("tf * 1000 div df"))
      .select(col("id"), col("term"), col("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = w.groupBy(col("id")).agg(sum(col("w") * col("w")).as("n2"))
    val pairs = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    pairs
      .join(norms.select(col("id").as("a_id"), col("n2").as("na2")), "a_id")
      .join(norms.select(col("id").as("b_id"), col("n2").as("nb2")), "b_id")
      .withColumn("cos_e6", round(col("dot").cast("double") /
        sqrt(col("na2").cast("double") * col("nb2").cast("double"))
        * lit(1000000.0)).cast("long"))
      .where(col("cos_e6") >= minCosE6)
      .select(col("a_id"), col("b_id"), col("dot"), col("na2"), col("nb2"),
        col("cos_e6"))
  }
}
