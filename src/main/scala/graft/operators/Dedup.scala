package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication family for event streams and LLM training-data pipelines:
  *
  *  - `keepFirst`: keyed first-wins dedupe — batch analogue of the
  *    reference's KeepFirstRow (P:common/functions/KeepFirstRow.java:14-48);
  *    streaming form is `dropDuplicatesWithinWatermark`.
  *  - `fingerprintDedup`: exact near-identical text dedup via normalized md5.
  *  - `shingles` / `ngramJaccardPairs`: exact n-gram Jaccard near-dup pairs
  *    through an inverted-index self-join (explode shingle → equi-join) —
  *    never an all-pairs cross join, so it scales with shingle collision
  *    counts, not |docs|².
  *  - `minHashLshPairs`: MinHash+banded-LSH candidate generation, the
  *    sub-quadratic path at 100 TB; candidates carry the signature-estimated
  *    Jaccard for thresholding. `minHashVerifiedPairs` composes it with the
  *    exact intersection kernel — block sub-quadratically, verify exactly.
  *  - `simHash64`: 64-bit SimHash fingerprints; near-dups = small Hamming
  *    distance (use `bit_count(a ^ b)`).
  */
object Dedup {

  /** First row per key by `orderCols` (make it total for determinism). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles per doc: (id, shingle) exploded rows.
    *
    * Repartitions on the id first: document corpora often arrive as few
    * small-but-heavy files, and the shingling expressions dominate — a
    * single-partition scan would serialize them on one core. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // codegen'd single-pass kernel (tokenize → n-grams → hash-set distinct);
    // set-equal to the declarative regex/transform/array_distinct chain it
    // replaced, ~5x cheaper on the scan stage
    graft.functions.WordShingles.register(docs.sparkSession)
    val spread = docs.repartition(col(idCol))
    spread.select(col(idCol),
      explode(graft.functions.WordShingles.wordShingles(col(textCol), n)).as("shingle"))
  }

  /** Per-doc sorted distinct int64 shingle hashes: (id, __arr, __n).
    *
    * The int64 form is what every set operation downstream actually needs
    * (equality for the inverted index, intersection for verification) and
    * moves ~8× fewer bytes through the exchanges than the UTF-8 grams. */
  def hashedShingleSets(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    graft.functions.WordShingles.register(docs.sparkSession)
    docs.repartition(col(idCol)).select(col(idCol),
        graft.functions.WordShingles.wordShingleHashes(col(textCol), n).as("__arr"))
      .withColumn("__n", size(col("__arr")).cast("long"))
  }

  /** Exact-Jaccard near-dup pairs with AllPairs-style prefix filtering.
    *
    * Keeps pairs with jaccard >= t = minJaccardNum/minJaccardDen, decided in
    * integer arithmetic (c·den >= num·(na+nb-c)) — no float thresholds.
    * Output: a_id, b_id, inter, na, nb (a_id < b_id).
    *
    * Scale: a naive shingle self-join is quadratic in the hottest shingle's
    * document frequency. Prefix filtering (Bayardo et al., "Scaling Up All
    * Pairs Similarity Search", WWW'07 — public result) is exactness-
    * preserving: J(A,B) ≥ t ⇒ |A∩B| ≥ ⌈t·|A|⌉, so A and B must share a
    * token among each one's first |X| − ⌈t·|X|⌉ + 1 tokens under ANY global
    * token order. Ordering rarest-first puts the hot shingles outside the
    * prefixes, so candidate generation touches mostly rare tokens; the
    * exact intersection count is then computed only for candidate pairs. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccardNum: Long, minJaccardDen: Long): DataFrame = {
    graft.functions.SortedLongIntersect.register(docs.sparkSession)
    // The shingling kernel feeds several plan branches; persist the compact
    // per-doc hash sets so it runs once. At scale this is the same trade as
    // materializing a shingle table before the self-join. No groupBy is
    // needed to form the sets — the kernel emits the whole (sorted) set per
    // input row, so the only shuffles left are the index self-join's.
    val sets = hashedShingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // carry the set size through the explode — saves a per-doc join later
    val sh = sets.select(col(idCol), col("__n"), explode(col("__arr")).as("shingle"))

    // rarest-first global order: (document frequency, shingle). The df
    // rides a window count over the shingle partition — one exchange on
    // the exploded frame instead of a groupBy plus a join back
    val dfW = Window.partitionBy(col("shingle"))
    val rankW = Window.partitionBy(col(idCol)).orderBy(col("__df"), col("shingle"))
    val ranked = sh.withColumn("__df", count(lit(1)).over(dfW))
      .withColumn("__rnk", row_number().over(rankW))
    // prefix length = n − ⌈t·n⌉ + 1, with ⌈a/b⌉ = (a+b−1) div b in integers
    val prefixLen = col("__n") -
      ((col("__n") * minJaccardNum + minJaccardDen - 1) / minJaccardDen).cast("long") + 1
    val prefix = ranked.where(col("__rnk") <= prefixLen)
      .select(col(idCol), col("shingle"), col("__rnk"), col("__n"))

    // PPJoin filters (Xiao et al., "Efficient Similarity Joins for Near
    // Duplicate Detection", WWW'08 — public result), both exactness-
    // preserving given the required overlap
    //   c_min = max(⌈t·max(na,nb)⌉, ⌈(t/(1+t))·(na+nb)⌉):
    //  - size filter: J ≥ t ⇒ t·max(na,nb) ≤ min(na,nb);
    //  - positional filter: for the first shared ordered token at positions
    //    (pa, pb), every common token sits at or after it in both docs, so
    //    c ≤ 1 + min(na−pa, nb−pb) must still reach c_min.
    val na = col("pa.__n"); val nb = col("pb.__n")
    val cMin = greatest(
      ((greatest(na, nb) * minJaccardNum + minJaccardDen - 1) / minJaccardDen).cast("long"),
      ((  (na + nb) * minJaccardNum + (minJaccardNum + minJaccardDen) - 1)
        / (minJaccardNum + minJaccardDen)).cast("long"))
    val sizeFilter = greatest(na, nb) * minJaccardNum <= least(na, nb) * minJaccardDen
    val positional = lit(1) + least(na - col("pa.__rnk"), nb - col("pb.__rnk")) >= cMin
    val cand = prefix.as("pa").join(prefix.as("pb"),
        col("pa.shingle") === col("pb.shingle") && col(s"pa.$idCol") < col(s"pb.$idCol") &&
          sizeFilter && positional)
      .select(col(s"pa.$idCol").as("a_id"), col(s"pb.$idCol").as("b_id"))
      .distinct()

    // exact intersection for candidates only: join each pair to its two
    // per-doc sorted hash sets and merge-count — one primitive-long pass
    // per candidate, no boxing, no re-exploding against the inverted index
    val out = cand
      .join(sets.select(col(idCol).as("a_id"), col("__arr").as("__sa"),
        col("__n").as("na")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("__arr").as("__sb"),
        col("__n").as("nb")), "b_id")
      .withColumn("inter",
        graft.functions.SortedLongIntersect.intersectCount(col("__sa"), col("__sb")))
    out
      .where(col("inter") * minJaccardDen >= (col("na") + col("nb") - col("inter")) * minJaccardNum)
      .select("a_id", "b_id", "inter", "na", "nb")
  }

  /** Exact CONTAINMENT near-dup pairs: directed (a, b) with
    * |A∩B| / |A| ≥ t = minContainNum/minContainDen over n-gram sets —
    * the asymmetric measure that catches a short document embedded in a
    * longer one, which symmetric Jaccard structurally misses (J ≤ |A|/|B|
    * caps out for size-skewed pairs no matter how complete the overlap).
    * The quote/boilerplate-inclusion detector of corpus dedup.
    *
    * Scale shape mirrors [[ngramJaccardPairs]] with the asymmetric prefix
    * filter: C(A→B) ≥ t ⇒ |A∩B| ≥ ⌈t·na⌉, so ONLY the probe side A needs
    * a prefix (first na − ⌈t·na⌉ + 1 tokens rarest-first) while the index
    * side B posts every token — candidate generation is linear in A's
    * prefix postings. Size filter nb ≥ ⌈t·na⌉ and the positional bound
    * 1 + min(na−pa, nb−pb) ≥ ⌈t·na⌉ (valid for the smallest-order common
    * token, which generates every qualifying pair) are both exactness-
    * preserving; the sorted-merge intersect then decides c·den ≥ na·num
    * in integers. Output: a_id, b_id (a ≠ b, directed), inter, na, nb. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minContainNum: Long, minContainDen: Long): DataFrame = {
    require(minContainNum > 0 && minContainNum <= minContainDen,
      s"containment threshold $minContainNum/$minContainDen out of (0, 1]")
    graft.functions.SortedLongIntersect.register(docs.sparkSession)
    val sets = hashedShingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = sets.select(col(idCol), col("__n"), explode(col("__arr")).as("shingle"))

    val dfW = Window.partitionBy(col("shingle"))
    val rankW = Window.partitionBy(col(idCol)).orderBy(col("__df"), col("shingle"))
    val ranked = sh.withColumn("__df", count(lit(1)).over(dfW))
      .withColumn("__rnk", row_number().over(rankW))
    // probe-side prefix: na − ⌈t·na⌉ + 1 rarest-first tokens
    val prefixLen = col("__n") -
      ((col("__n") * minContainNum + minContainDen - 1) / minContainDen).cast("long") + 1
    val prefix = ranked.where(col("__rnk") <= prefixLen)
      .select(col(idCol), col("shingle"), col("__rnk"), col("__n"))
    val full = ranked.select(col(idCol), col("shingle"), col("__rnk"), col("__n"))

    val na = col("pa.__n"); val nb = col("pb.__n")
    val cMin = ((na * minContainNum + minContainDen - 1) / minContainDen).cast("long")
    val sizeFilter = nb >= cMin
    val positional = lit(1) + least(na - col("pa.__rnk"), nb - col("pb.__rnk")) >= cMin
    val cand = prefix.as("pa").join(full.as("pb"),
        col("pa.shingle") === col("pb.shingle") &&
          col(s"pa.$idCol") =!= col(s"pb.$idCol") && sizeFilter && positional)
      .select(col(s"pa.$idCol").as("a_id"), col(s"pb.$idCol").as("b_id"))
      .distinct()

    cand
      .join(sets.select(col(idCol).as("a_id"), col("__arr").as("__sa"),
        col("__n").as("na")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("__arr").as("__sb"),
        col("__n").as("nb")), "b_id")
      .withColumn("inter",
        graft.functions.SortedLongIntersect.intersectCount(col("__sa"), col("__sb")))
      .where(col("inter") * minContainDen >= col("na") * minContainNum)
      .select("a_id", "b_id", "inter", "na", "nb")
  }

  /** MinHash signatures: k per-doc minima of independently-salted re-hashes
    * of the doc's int64 shingle hashes. No shuffle at all when the kernel
    * emits whole sets per row — the k minima reduce inside `transform`+
    * `array_min` over the set array; salting re-hashes an 8-byte long
    * instead of re-hashing the gram text k times. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    // `__n > 0` keeps parity with the exploded form: shingle-less docs have
    // no signature (array_min of [] would be null)
    val sets = hashedShingleSets(docs, idCol, textCol, n).where(col("__n") > 0)
    sets.select(col(idCol) +: minHashSigCols(col("__arr"), numHashes): _*)
  }

  /** The k salted-min signature columns over an int64 shingle-hash array
    * column — factored so the streaming monitor
    * ([[graft.streaming.LshDedupTws]]) computes the IDENTICAL signature
    * the batch path does (shared expressions, not parallel formulas). */
  def minHashSigCols(arr: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i =>
      array_min(transform(arr, s => xxhash64(lit(i), s))).as(s"h$i"))

  /** The banded (band, bucket) struct columns over signature columns
    * h0..h{numHashes−1} — the exact bucketing [[minHashLshPairs]] joins
    * on, shared with the streaming monitor for the same reason. */
  def bandStructCols(numHashes: Int, bands: Int): Seq[Column] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    (0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((bIdx * r until (bIdx + 1) * r).map(i => col(s"h$i")): _*)
          .as("bucket"))
    }
  }

  /** Banded-LSH candidate pairs from MinHash signatures with the
    * signature-estimated Jaccard (fraction of matching components).
    * bands·rowsPerBand must equal numHashes. Output:
    * a_id, b_id, matching, numHashes — filter `matching/numHashes` as the
    * estimate; re-rank with `ngramJaccardPairs` semantics where exactness
    * matters. Sub-quadratic: pairs only form inside equal band buckets. */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // signatures feed both sides of the band self-join — materialize once
    val sig = minHashSignatures(docs, idCol, textCol, n, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = sig.withColumn("__band",
      explode(array(bandStructCols(numHashes, bands): _*)))
    val a = exploded.as("a"); val b = exploded.as("b")
    val sigEq = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, col("a.__band") === col("b.__band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        sigEq.as("matching"), lit(numHashes).as("num_hashes"))
      .distinct()
  }


  /** MinHash-LSH candidates exact-verified to jaccard >= num/den — the full
    * production near-dup path (block sub-quadratically, then verify), with
    * output identical to [[ngramJaccardPairs]] WHENEVER blocking recall is
    * complete for the threshold. Recall for a pair at jaccard s is
    * 1-(1-s^r)^bands (r = numHashes/bands); at r=1 a qualifying pair is
    * missed only if ALL numHashes minima differ — P(miss) = (1-s)^numHashes
    * (~1e-13 at s=0.6, numHashes=32) — which is what lets a DuckDB oracle
    * gate this on exact all-pairs SQL: a recall miss fails loudly as a row
    * diff instead of hiding behind an estimate. Verification reuses the
    * per-doc sorted hash sets and the primitive merge-intersect kernel. */
  def minHashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int,
      minJaccardNum: Long, minJaccardDen: Long): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    graft.functions.SortedLongIntersect.register(docs.sparkSession)
    val r = numHashes / bands
    // ONE persisted shingle-set frame feeds signature building, BOTH
    // sides of the band self-join, and verification — without it the
    // self-join recomputes the scan+shingle+signature subtree per side
    // (measured 8x slower). Lifecycle contract (same as the other miners
    // here): no action runs inside this function, so the returned plan
    // pins the blocks until the session drops them — callers mining many
    // corpora in one session should materialize the output and
    // clearCache(), as the gate harness does.
    val sets = hashedShingleSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mins = (0 until numHashes).map(i =>
      array_min(transform(col("__arr"), s => xxhash64(lit(i), s))).as(s"h$i"))
    val sig = sets.where(col("__n") > 0).select(col(idCol) +: mins: _*)
    val bandCols = (0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((bIdx * r until (bIdx + 1) * r).map(i => col(s"h$i")): _*).as("bucket"))
    }
    // the signature-match estimate is pointless when exact verification
    // follows, so each join side carries only (id, band, bucket) — not the
    // numHashes signature columns — and the pair-dedup shuffles two longs
    val exploded = sig.select(col(idCol), explode(array(bandCols: _*)).as("__band"))
    val a = exploded.as("a"); val b = exploded.as("b")
    val cand = a
      .join(b, col("a.__band") === col("b.__band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
    cand
      .join(sets.select(col(idCol).as("a_id"), col("__arr").as("__sa"),
        col("__n").as("na")), "a_id")
      .join(sets.select(col(idCol).as("b_id"), col("__arr").as("__sb"),
        col("__n").as("nb")), "b_id")
      .withColumn("inter",
        graft.functions.SortedLongIntersect.intersectCount(col("__sa"), col("__sb")))
      .where(col("inter") * minJaccardDen >= (col("na") + col("nb") - col("inter")) * minJaccardNum)
      .select("a_id", "b_id", "inter", "na", "nb")
  }

  /** Connected components over a near-duplicate pair graph — the step
    * between pair mining and actual dedup: each component keeps ONE
    * canonical document (the minimum id), everything else drops. Pairs
    * from any miner ([[ngramJaccardPairs]], [[minHashLshPairs]],
    * `Similarity.lshBandedNearDupPairs`) plug in.
    *
    * Iterative min-label propagation with path halving: every round each
    * node adopts the smallest label among itself and its neighbors, then
    * jumps to its label's label — the pointer-doubling step cuts rounds
    * to O(log diameter) (the same acceleration as the public two-phase
    * large-star/small-star formulation, Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Each round is two
    * equi-joins + one min-aggregation, all shuffled on node id — no
    * driver-side graph; `maxIter` rounds therefore cover components of
    * diameter ~2^maxIter, and the loop exits early via an
    * aggregated-scalar convergence probe (sum of labels is strictly
    * decreasing until the fixpoint — never a collect of node data).
    *
    * Hitting `maxIter` before the fixpoint means labels are WRONG for any
    * component with diameter > maxIter, silently — so by default that
    * throws; pass `failOnMaxIter = false` for best-effort labels (logged).
    *
    * Small graphs take a driver union-find fast path instead (the same
    * size-gated strategy swap as a broadcast join): a pair graph under
    * `smallGraphMaxEdges` long-id edges (~64 MB at the default) resolves
    * in one collect + one parallelize, skipping the per-round join jobs
    * entirely. Mining typically reduces even petabyte corpora to a pair
    * graph orders of magnitude smaller than the input; graphs above the
    * gate (or with non-long ids) run the distributed loop.
    *
    * `pairs` should be MATERIALIZED (a read-back parquet/cached frame, as
    * the shared pair-graph artifact is): the gate probes
    * `limit(n+1).count()` before the real pass, so an unmaterialized
    * expensive mining plan would pay the mining twice. Pass
    * `smallGraphMaxEdges = 0` to skip the probe entirely.
    * Output: node, component (min id in the node's component). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, failOnMaxIter: Boolean = true,
      smallGraphMaxEdges: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val longIds = pairs.schema(aCol).dataType == LongType &&
      pairs.schema(bCol).dataType == LongType
    if (longIds && smallGraphMaxEdges > 0 &&
      pairs.limit(math.min(smallGraphMaxEdges + 1, Int.MaxValue.toLong).toInt)
        .count() <= smallGraphMaxEdges)
      return smallGraphComponents(pairs, aCol, bCol)
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce: an empty pair graph sums to NULL, not 0
    var lastSum = labels.agg(coalesce(sum(col("label")), lit(0L)))
      .head().getLong(0)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // path halving: adopt the label's own label. Labels are always node
      // ids within the component (min over component members), so the
      // lookup stays in-component and the fixpoint is unchanged; each
      // round doubles the distance a minimum has travelled.
      val next = stepped.as("x").join(
          stepped.select(col("node").as("label"), col("label").as("__ll")).as("y"),
          Seq("label"), "left")
        .select(col("node"),
          coalesce(col("__ll"), col("label")).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s = next.agg(coalesce(sum(col("label")), lit(0L)))
        .head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == lastSum
      lastSum = s
      it += 1
    }
    edges.unpersist()
    if (!converged) {
      val msg = s"connectedComponents hit maxIter=$maxIter before the " +
        "fixpoint: a component has diameter > maxIter and its labels are " +
        "not canonical; raise maxIter"
      if (failOnMaxIter) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** Driver union-find (rank + path compression) for size-gated small
    * pair graphs; emits the same (node, min-id component) frame as the
    * distributed loop. */
  private def smallGraphComponents(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    val rank = scala.collection.mutable.Map.empty[Long, Int]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (cmpA, cmpB) = (rank.getOrElse(ra, 0), rank.getOrElse(rb, 0))
        if (cmpA < cmpB) parent(ra) = rb
        else if (cmpA > cmpB) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = cmpA + 1 }
      }
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val out = byRoot.valuesIterator.flatMap { members =>
      val cmp = members.min
      members.iterator.map(m => (m, cmp))
    }.toSeq
    spark.createDataset(out).toDF("node", "component")
      .repartition(col("node"))
  }

  /** 64-bit SimHash over whitespace tokens (term-frequency weighted).
    *
    * Token hashes are splitMix64-finished Karp–Rabin fingerprints
    * ([[graft.functions.PolyHash64]]) rather than xxhash64: identical
    * avalanche quality for the bit-vote, but every step is expressible in
    * ANSI SQL, so the q22 gate compares full signatures against a DuckDB
    * oracle instead of resting on unit tests. */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.PolyHash64.register(docs.sparkSession)
    val tok = docs.repartition(col(idCol)).select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("__h", graft.functions.PolyHash64.polyHash64(col("tok")))
    val bitSums: Seq[Column] = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(shiftleft(lit(1L), j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim: Column = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x: Column, y: Column) => x.bitwiseOR(y))
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** EXACT Hamming-≤maxDist pairs over 64-bit fingerprints by pigeonhole
    * banding (Manku–Jain–Sarma 2007, "Detecting Near-Duplicates for Web
    * Crawling" §3 — the production SimHash pairing): split the word into
    * maxDist+1 disjoint bit blocks; a pair within distance d ≤ maxDist
    * has at most maxDist differing bits, so by pigeonhole at least one
    * block matches EXACTLY — candidates come from equi-joins on block
    * values, and the `bit_count(a ^ b)` verify removes false positives.
    * Unlike MinHash-LSH banding this is exact by construction: no recall
    * loss at any distance ≤ maxDist.
    *
    * Scale shape: the fingerprint frame explodes ×(maxDist+1) block
    * rows; pairs form only inside equal (block, value) buckets, so the
    * RANDOM-collision candidate volume is ≈ n²·(maxDist+1)·2^(−64/(maxDist+1))
    * — the block width 64/(maxDist+1) is the whole game. maxDist ≤ 3
    * (Manku's production setting: ≥16-bit blocks, ~6e-5 of n²) is the
    * web-scale regime; maxDist = 7 (8-bit blocks, ~3% of n²) is the
    * ceiling this operator accepts, loud require above it — wider
    * tolerances need multi-probe permuted tables, a different design.
    * The one documented hot bucket is MANY IDENTICAL fingerprints
    * (exact dups): their block buckets are cliques — run exact dedup
    * first (the house pipeline order).
    * Output: (a_id, b_id, dist), a_id < b_id. */
  def hammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"hammingPairs: 0 ≤ maxDist ≤ 7 (8-bit minimum block width — " +
        s"see scaladoc for the candidate-volume bound), got $maxDist")
    val b = maxDist + 1
    val blocks = (0 until b).map { j =>
      val lo = j * 64 / b
      val hi = (j + 1) * 64 / b
      val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1L
      struct(lit(j).as("blk"),
        shiftrightunsigned(col(sigCol), lo).bitwiseAND(lit(mask)).as("v"))
    }
    val exploded = sigs.select(col(idCol), col(sigCol))
      .withColumn("__b", explode(array(blocks: _*)))
    val l = exploded.as("a")
    val r = exploded.as("b")
    l.join(r, col("a.__b") === col("b.__b") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        expr(s"bit_count(a.$sigCol ^ b.$sigCol)").cast("long").as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Cross-source duplicate census — the ingest-dedup question "how much
    * of feed B did feed A already deliver": rows fingerprint by a
    * cross-engine-stable md5 over unit-separated canonical fields (the
    * 0x1F separator keeps "ab"+"c" and "a"+"bc" apart; callers pass
    * INTEGER/STRING fields only — float-to-string formatting is not
    * portable), then one hash aggregation surfaces fingerprints seen in
    * ≥2 distinct sources. The groupBy on the 128-bit fingerprint is the
    * exact-dedup shuffle shape — the overlap census rides it for free. */
  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
    * plagiarism detector's selection rule): hash every word k-gram, then
    * from each window of `w` consecutive k-gram hashes keep the minimum,
    * ties to the RIGHTMOST position; the guarantee is that any shared
    * run of ≥ w+k−1 words yields at least one shared fingerprint, while
    * only ~2/(w+1) of grams are kept.
    *
    * Determinism (pinned, oracle-replayed): tokens = whitespace split of
    * trim(lower(text)) with empties dropped; gram hash =
    * splitmix64(Karp–Rabin mod 2⁶¹−1 over the space-joined gram's bytes)
    * logically right-shifted 1 (nonnegative, so signed-LONG order ==
    * the oracle's UBIGINT order); the per-window argmin rides ONE
    * struct-min aggregate over (h, −pos) — both engines compare the
    * pair lexicographically, so the rightmost-tie rule needs no window
    * function at all.
    *
    * Shape: grams explode into their ≤ w member windows (a ×w row
    * blow-up of the gram frame that partial aggregation collapses
    * map-side), one hash aggregate to (doc, window) grain, one distinct
    * to the fingerprint set. All keys carry doc_id — no skewed global
    * state, no window over raw tokens. */
  def winnowingFingerprints(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    graft.functions.PolyHash64.register(docs.sparkSession)
    val toks = docs.select(col(idCol).as("doc"),
      filter(split(trim(lower(col(textCol))), "\\s+"), t => t =!= "")
        .as("__ts"))
    val grams = toks
      .select(col("doc"), (size(col("__ts")) - (k - 1)).as("__ng"),
        posexplode(when(size(col("__ts")) >= k,
            transform(sequence(lit(1), size(col("__ts")) - (k - 1)), i =>
              array_join(slice(col("__ts"), i, lit(k)), " ")))
          .otherwise(array().cast("array<string>"))).as(Seq("__p0", "g")))
      .select(col("doc"), col("__ng"), (col("__p0") + 1).as("pos"),
        shiftrightunsigned(
          graft.functions.PolyHash64.polyHash64(col("g")), 1).as("h"))
    // each gram at pos joins windows ws ∈ [pos−w+1, pos] clipped to the
    // valid start range [1, max(1, ng−w+1)]
    val member = grams
      .select(col("doc"), col("pos"), col("h"),
        explode(sequence(
          greatest(lit(1), col("pos") - (w - 1)),
          least(col("pos"), greatest(lit(1), col("__ng") - (w - 1)))))
          .as("ws"))
    member.groupBy(col("doc"), col("ws"))
      .agg(min(struct(col("h"), (-col("pos")).as("np"))).as("__m"))
      .select(col("doc"), col("__m.h").as("fingerprint"),
        (-col("__m.np")).cast("long").as("pos"))
      .distinct()
  }

  /** Shared-fingerprint document pairs over [[winnowingFingerprints]] —
    * the plagiarism-candidate report: pairs sharing ≥ `minShared`
    * selected fingerprints, with the shared count. Join key is the
    * fingerprint VALUE (hash-partitioned — no doc×doc product); the
    * distinct fingerprint set per doc bounds the blow-up at ~2/(w+1) of
    * the gram count. */
  def winnowingSharedPairs(fingerprints: DataFrame,
      minShared: Long): DataFrame = {
    val fp = fingerprints.select(col("doc"), col("fingerprint")).distinct()
    fp.as("x").join(fp.as("y"),
        col("x.fingerprint") === col("y.fingerprint") &&
        col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  def crossSourceDuplicates(df: DataFrame, sourceCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty)
    val fp = md5(concat_ws("\u001f",
      contentCols.map(c => col(c).cast("string")): _*))
    df.select(col(sourceCol).as("source"), fp.as("fp"))
      .groupBy(col("fp"))
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_rows"))
      .where(col("n_sources") >= 2)
  }

  /** MinHash-LSH parameter planner (Leskovec/Rajaraman/Ullman MMDS
    * §3.4): for every (bands b, rows r) layout of a signature budget,
    * the S-curve p(s) = 1 − (1 − s^r)^b evaluated on a fixed 1%-step
    * similarity grid, its value at the target threshold, and the
    * false-positive / false-negative areas below/above the threshold —
    * the table that picks (b, r) BEFORE burning a corpus pass on a bad
    * layout. Grid areas are Σ of per-point pinned double chains rounded
    * to e6 BEFORE summation (the q374 rule), so the table hash-gates.
    *
    * Shape: |layouts| × 99 grid rows — a constants table; no data scan
    * at all. Layouts enumerate divisor pairs b·r = `signatureSize`. */
  def lshPlannerE6(spark: org.apache.spark.sql.SparkSession,
      signatureSize: Int, thresholdE6: Long): DataFrame = {
    require(signatureSize >= 2 && signatureSize <= 4096)
    // the threshold must sit ON the 1%-step grid: p_at_threshold_e6 reads
    // the grid point s_e6 = thresholdE6 exactly, and the FP/FN areas split
    // at the same value — an off-grid threshold would silently snap the
    // point readout while splitting the areas elsewhere (r13 ADVICE)
    require(thresholdE6 % 10000L == 0L &&
        thresholdE6 >= 10000L && thresholdE6 <= 990000L,
      s"lshPlannerE6: thresholdE6 must be a 1%-grid multiple of 10000 in " +
        s"[10000, 990000], got $thresholdE6")
    import spark.implicits._
    val layouts = (1 to signatureSize)
      .filter(b => signatureSize % b == 0)
      .map(b => (b, signatureSize / b))
    val base = layouts.toDF("b", "r")
    base.crossJoin(
        spark.range(1, 100).select((col("id") * 10000L).as("s_e6")))
      .withColumn("p_e6", expr(
        """CAST(round((1.0 - pow(1.0 - pow(s_e6 / 1000000.0,
          |  CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1000000.0)
          | AS BIGINT)""".stripMargin))
      .groupBy(col("b"), col("r"))
      .agg(
        max(when(col("s_e6") === lit(thresholdE6),
          col("p_e6"))).as("p_at_threshold_e6"),
        sum(when(col("s_e6") < thresholdE6, col("p_e6")).otherwise(0L))
          .as("__fp"),
        sum(when(col("s_e6") >= thresholdE6,
          lit(1000000L) - col("p_e6")).otherwise(0L)).as("__fn"))
      .select(col("b"), col("r"), col("p_at_threshold_e6"),
        expr("__fp div 99").as("fp_area_e6"),
        expr("__fn div 99").as("fn_area_e6"),
        expr("(__fp + __fn) div 99").as("total_err_e6"))
  }
}

