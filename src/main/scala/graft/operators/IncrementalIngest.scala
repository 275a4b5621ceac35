package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus ingestion: the daily-crawl shape — a NEW batch of
  * documents deduplicated against a (huge) HISTORICAL corpus plus itself,
  * producing a per-document decision table instead of silently dropping
  * rows (ingest pipelines audit their drop reasons).
  *
  * Verdicts, in precedence order (first match wins; `ref_id` is the
  * matched document, minimum id for determinism):
  *  1. `dup_exact_history` — trimmed text equals a history doc's;
  *  2. `dup_exact_batch`   — equals a SMALLER-id batch doc's;
  *  3. `dup_near_history`  — word-n-gram Jaccard ≥ num/den vs a history doc;
  *  4. `dup_near_batch`    — Jaccard ≥ num/den vs a smaller-id batch doc;
  *  5. `new`               — survives, append to the corpus.
  *
  * Batch-internal near-dup uses the GREEDY-BY-ID rule (a doc drops iff a
  * smaller-id near-dup exists), not transitive components — the same
  * first-wins semantics as KeepFirstRow, decidable per-pair, which keeps
  * the whole decision table exactly SQL-expressible (the gate's oracle)
  * while q41's component-based variant remains available for batch-wide
  * canonicalization.
  *
  * Scale shape:
  *  - exact matching shuffles an 8-byte xxhash64 of the text, never the
  *    text; equality is re-verified post-join so hash collisions can't
  *    fabricate a dup.
  *  - near matching is MinHash-banded (r=1: miss probability (1-s)^k,
  *    ~1e-13 at s=0.6, k=32 — the property that lets an exact all-pairs
  *    oracle gate it), probing history buckets with batch buckets only:
  *    cost scales with the BATCH, not with history². History shingle
  *    sets/signatures are recomputed here for self-containment; a real
  *    deployment materializes them once (the [[graft.sinks.UpsertTable]]
  *    pattern) and this operator's joins read them as-is.
  *  - candidates verify with the primitive sorted-set intersect kernel;
  *    the sketch never decides — only exact Jaccard reaches the verdict.
  */
object IncrementalIngest {

  def ingest(history: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int,
      minJacNum: Long, minJacDen: Long): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.SortedLongIntersect.register(spark)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    // ---- exact tier: hash-keyed equi-join, text-verified ----
    val hTxt = history.select(col(idCol).cast("long").as("h_id"),
      trim(col(textCol)).as("__ht"))
      .withColumn("__hk", xxhash64(col("__ht")))
    val bTxt = batch.select(col(idCol).cast("long").as("doc_id"),
      trim(col(textCol)).as("__bt"))
      .withColumn("__bk", xxhash64(col("__bt")))
      .persist(mem)
    val exactHist = bTxt.join(hTxt, col("__bk") === col("__hk") &&
        col("__bt") === col("__ht"))
      .groupBy("doc_id").agg(min(col("h_id")).as("eh"))
    val firstOfText = bTxt.groupBy(col("__bk"), col("__bt"))
      .agg(min(col("doc_id")).as("eb"))
    val exactBatch = bTxt.join(firstOfText, Seq("__bk", "__bt"))
      .where(col("eb") < col("doc_id"))
      .select(col("doc_id"), col("eb"))

    // ---- near tier: banded MinHash probe + exact-Jaccard verify ----
    val hSets = Dedup.hashedShingleSets(history, idCol, textCol, n)
      .select(col(idCol).cast("long").as("h_id"),
        col("__arr").as("__ha"), col("__n").as("__hn"))
      .persist(mem)
    val bSets = Dedup.hashedShingleSets(batch, idCol, textCol, n)
      .select(col(idCol).cast("long").as("doc_id"),
        col("__arr").as("__ba"), col("__n").as("__bn"))
      .persist(mem)
    def buckets(sets: DataFrame, id: String, arr: String) = sets
      .where(col(if (arr == "__ha") "__hn" else "__bn") > 0)
      .select(col(id), posexplode(array((0 until numHashes).map(i =>
        array_min(transform(col(arr), s => xxhash64(lit(i), s)))): _*)))
      .select(col(id), col("pos").as("__band"), col("col").as("__bucket"))
    val hBuckets = buckets(hSets, "h_id", "__ha")
    val bBuckets = buckets(bSets, "doc_id", "__ba")

    def verified(cand: DataFrame, leftSets: DataFrame, leftId: String,
        leftArr: String, leftN: String): DataFrame = cand
      .join(leftSets, leftId)
      .join(bSets, "doc_id")
      .withColumn("__i", graft.functions.SortedLongIntersect
        .intersectCount(col(leftArr), col("__ba")))
      .where(col("__i") * minJacDen >=
        (col(leftN) + col("__bn") - col("__i")) * minJacNum)

    val nearHist = verified(
      bBuckets.join(hBuckets, Seq("__band", "__bucket"))
        .select("doc_id", "h_id").distinct(),
      hSets, "h_id", "__ha", "__hn")
      .groupBy("doc_id").agg(min(col("h_id")).as("nh"))
    val bAsRef = bSets.select(col("doc_id").as("ref_id"),
      col("__ba").as("__ra"), col("__bn").as("__rn"))
    val nearBatch = verified(
      bBuckets.join(
          bBuckets.select(col("doc_id").as("ref_id"), col("__band"),
            col("__bucket")),
          Seq("__band", "__bucket"))
        .where(col("ref_id") < col("doc_id"))
        .select("doc_id", "ref_id").distinct(),
      bAsRef, "ref_id", "__ra", "__rn")
      .groupBy("doc_id").agg(min(col("ref_id")).as("nb"))

    // ---- verdicts, precedence-ordered ----
    bTxt.select("doc_id")
      .join(exactHist, Seq("doc_id"), "left")
      .join(exactBatch, Seq("doc_id"), "left")
      .join(nearHist, Seq("doc_id"), "left")
      .join(nearBatch, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("eh").isNotNull, lit("dup_exact_history"))
          .when(col("eb").isNotNull, lit("dup_exact_batch"))
          .when(col("nh").isNotNull, lit("dup_near_history"))
          .when(col("nb").isNotNull, lit("dup_near_batch"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("eh"), col("eb"), col("nh"), col("nb")).as("ref_id"))
  }
}
