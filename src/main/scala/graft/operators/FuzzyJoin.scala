package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-threshold self-join (fuzzy match): all pairs of strings
  * with Levenshtein distance ≤ `maxDist` — entity resolution over names,
  * near-miss detection over identifiers, typo clustering over queries.
  *
  * A naive all-pairs `levenshtein` is quadratic; the classic exact
  * blocking (Gravano et al., "Approximate String Joins in a Database
  * (Almost) for Free", VLDB'99 — public result) uses two NECESSARY
  * conditions, so no qualifying pair is lost before the exact verify:
  *
  *  - length filter: |len(a) − len(b)| ≤ d (each edit changes length by
  *    at most 1);
  *  - q-gram count filter: one edit destroys at most q of a string's
  *    overlapping q-grams, so dist ≤ d ⇒ the pair shares at least
  *    max(na, nb) − q·d q-gram occurrences (na = len − q + 1 grams).
  *
  * Shape at scale: explode q-grams (positions dropped — the count bound
  * doesn't need them), equi-join on the gram, count shared grams per
  * candidate pair, keep pairs meeting the bound, THEN run `levenshtein`
  * only on survivors — codegen'd built-in, no UDF. Strings too short for
  * a positive bound (len ≤ q·d + q − 1) can't be blocked by grams; they
  * fall back to a length-bucketed cross join, which is bounded because
  * the strings are short and the bucket width is 2d+1.
  *
  * Skew (`maxGramDf`): a scorching-hot q-gram concentrates its join group
  * — the known failure mode of gram blocking at scale. With
  * `maxGramDf = Some(t)`, grams occurring more than t times corpus-wide
  * are EXCLUDED from candidate generation, exactness-preserved by two
  * adjustments. (1) Common occurrences inside dropped grams number at
  * most min(dropA, dropB) (each side's own dropped-occurrence count), so
  * the pair bound weakens to B − least(dropA, dropB). (2) A string whose
  * own guarantee (len − q + 1 − q·d − drop) is no longer positive can't
  * promise a surviving shared gram with anyone, so it joins the bounded
  * fallback tier — and for a non-fallback pair, the side attaining the
  * min drop still satisfies its positive individual guarantee, so the
  * pair is always enumerated by some kept gram. Hot grams carry the
  * least blocking information anyway (df counts everyone), so the
  * candidate set barely widens while the worst join group shrinks from
  * the hot gram's df² to t·df.
  *
  * Output: (a_id, b_id, a_val, b_val, dist), a_id < b_id, dist ≤ maxDist.
  */
object FuzzyJoin {

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995): sort the
    * records by a blocking key and compare each record only against its
    * `window` successors in sort order — candidate volume is n·window
    * instead of n², with NO gram index.
    *
    * The distributed form partitions by a coarse `blockExpr` prefix and
    * sorts WITHIN each block: pairs never straddle a block boundary,
    * which is the standard multi-pass trade-off (production runs repeat
    * with a second key to recover boundary pairs; here one pass is the
    * contract and the oracle replays the same block semantics). This
    * avoids the global-sort single-partition window trap — each block is
    * an independent sorted run, so the plan is one hash partition by
    * block + intra-partition sort, no driver bottleneck.
    *
    * Output: (a_val, b_val, rank_gap) for each pair with sort-rank
    * distance 1..window inside a block, a_val in sort order before
    * b_val. Scoring/thresholding is the caller's (compose with a
    * similarity kernel).
    */
  def sortedNeighborhoodPairs(df: DataFrame, strCol: String,
      blockExpr: Column, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(strCol).cast("string").as("v"),
        blockExpr.cast("string").as("blk"))
      .where(col("v").isNotNull).distinct()
    val w = Window.partitionBy(col("blk")).orderBy(col("v"))
    val withLeads = base.select(col("blk") +: col("v").as("a_val") +:
      (1 to window).map(i => lead(col("v"), i).over(w).as(s"n$i")): _*)
    val stacked = withLeads.select(col("a_val"),
      posexplode(array((1 to window).map(i => col(s"n$i")): _*))
        .as(Seq("gap0", "b_val")))
    stacked.where(col("b_val").isNotNull)
      .select(col("a_val"), col("b_val"),
        (col("gap0") + 1).cast("long").as("rank_gap"))
  }

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      q: Int, maxDist: Int, maxGramDf: Option[Long] = None): DataFrame = {
    require(q >= 2 && maxDist >= 1, s"q=$q maxDist=$maxDist out of range")
    val rows0 = df.select(col(idCol).cast("long").as("id"),
        col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull)
    // r15 optimization round: when the input is heavily duplicated, run
    // ALL similarity work at DISTINCT-STRING grain and re-attach ids
    // afterwards (the "decide with small rows, move big rows once"
    // rule). Entity-resolution inputs often are (q92's quarter-part
    // slice: 5,000 rows, 64 distinct names — the gram join was paying
    // the duplication factor SQUARED), and edit distance only sees the
    // string. Representative id = the group's min id (deterministic);
    // identical-string pairs (dist 0) never reach the gram machinery at
    // all — they expand directly from the duplicate groups. Output
    // multiset is unchanged: a (s1 ≠ s2) id pair expands exactly once
    // from its distinct-string pair, a (s1 = s2) pair exactly once from
    // its group, and the a_id < b_id orientation re-derives per id
    // pair. Low-duplication inputs (factor < 2 — synthetic keys,
    // id-suffixed names) skip straight to the gram engine: the dedup +
    // re-attach jobs would cost more than the squared factor saves.
    // The path choice is COUNTED (one map-combined aggregate), never
    // guessed — both paths produce the identical pair multiset. The
    // counting scan runs UNCACHED (r16, ADVICE): on the low-duplication
    // early return selfJoinDistinct persists its own projection of the
    // same rows, so a persist here would be a redundant second cache of
    // one-read data; only the high-duplication path (3 further reads)
    // caches.
    val nd = rows0.agg(count(lit(1)).as("n"),
      count_distinct(col("s")).as("d")).first()
    if (nd.getLong(0) < 2 * nd.getLong(1))
      return selfJoinDistinct(rows0, q, maxDist, maxGramDf)
    val rows = rows0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = rows.groupBy(col("s"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = selfJoinDistinct(reps.select(col("id"), col("s")),
      q, maxDist, maxGramDf)
    val left = rows.select(col("id").as("id1"), col("s").as("s1"))
    val right = rows.select(col("id").as("id2"), col("s").as("s2"))
    val cross = core
      .select(col("a_val").as("s1"), col("b_val").as("s2"), col("dist"))
      .join(left, "s1").join(right, "s2")
      .select(least(col("id1"), col("id2")).as("a_id"),
        greatest(col("id1"), col("id2")).as("b_id"),
        when(col("id1") <= col("id2"), col("s1")).otherwise(col("s2"))
          .as("a_val"),
        when(col("id1") <= col("id2"), col("s2")).otherwise(col("s1"))
          .as("b_val"),
        col("dist"))
    val dupRows = rows
      .join(reps.where(col("cnt") >= 2).select(col("s")), "s")
    val intra = dupRows.as("a").join(dupRows.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.s").as("a_val"), col("b.s").as("b_val"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
    cross.unionByName(intra)
  }

  /** The gram-blocked edit-distance join engine (the pre-r15 selfJoin
    * body, unchanged): correct for ANY (id, s) input — [[selfJoin]]
    * routes low-duplication inputs here directly and high-duplication
    * inputs through the distinct-string grain first. */
  private def selfJoinDistinct(df: DataFrame, q: Int, maxDist: Int,
      maxGramDf: Option[Long]): DataFrame = {
    val base = df.select(col("id"), col("s"))
      .withColumn("len", length(col("s")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val minBlockableLen = q * maxDist + q // bound > 0 ⇔ len−q+1 > q·d

    // grams: overlapping substrings of length q, with multiplicity —
    // the count bound is on gram OCCURRENCES, so no distinct here.
    val allGrams = base.where(col("len") >= minBlockableLen)
      .select(col("id"), col("len"),
        explode(expr(s"transform(sequence(1, len - $q + 1), " +
          s"i -> substring(s, i, $q))")).as("g"))

    // Stop-gram tier: tag each occurrence with its gram's corpus df (one
    // window exchange on the gram — no groupBy + join-back), drop hot
    // grams from blocking, and carry each string's dropped-occurrence
    // count into the bound.
    val (grams, dropCnt) = maxGramDf match {
      case None =>
        (allGrams, base.select(col("id"), lit(0L).as("drop_cnt")))
      case Some(t) =>
        val withDf = allGrams.withColumn("__df",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("g"))))
        val kept = withDf.where(col("__df") <= t).drop("__df")
        val drops = withDf
          .groupBy("id")
          .agg(sum(when(col("__df") > t, 1L).otherwise(0L)).as("drop_cnt"))
        (kept, base.select(col("id"))
          .join(drops, Seq("id"), "left").na.fill(0L, Seq("drop_cnt")))
    }

    // A string is gram-blockable only while its OWN guarantee survives
    // the dropped grams; the rest (including all below minBlockableLen)
    // go to the bounded fallback tier.
    val guarantee = base.join(dropCnt, "id")
      .withColumn("__guar",
        col("len") - lit(q - 1) - lit(q * maxDist) - col("drop_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blockableIds = guarantee.where(col("__guar") > 0)
      .select(col("id"), col("drop_cnt"))
    val fallback = guarantee.where(col("__guar") <= 0)
      .select(col("id"), col("len"))

    val keptBlockable = grams
      .join(blockableIds.select(col("id"), col("drop_cnt")), "id")
    val a = keptBlockable.as("a"); val b = keptBlockable.as("b")
    val blocked = a.join(b,
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.len").as("la"), col("b.len").as("lb"),
        col("a.drop_cnt").as("da"), col("b.drop_cnt").as("db"))
      .agg(count(lit(1)).as("shared"))
      // shared counts gram-PAIRS; a string's gram can match several of
      // the other's. That only over-counts, and the bound is a lower
      // bound on true common KEPT occurrences — still exactness-
      // preserving.
      .where(col("shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(q * maxDist) -
          least(col("da"), col("db")))
      .select("a_id", "b_id")

    // Fallback strings pair against EVERYTHING within the length filter
    // (including blockable partners — pairs the gram tier can't see
    // because one side lost its positive bound). Both-fallback pairs
    // arrive twice (once per side) — normalize + distinct.
    val shortPairs = fallback.as("a").join(base.as("b"),
        col("a.id") =!= col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(least(col("a.id"), col("b.id")).as("a_id"),
        greatest(col("a.id"), col("b.id")).as("b_id"))
      .distinct()

    blocked.unionByName(shortPairs)
      .join(base.select(col("id").as("a_id"), col("s").as("a_val")), "a_id")
      .join(base.select(col("id").as("b_id"), col("s").as("b_val")), "b_id")
      .withColumn("dist", levenshtein(col("a_val"), col("b_val")))
      .where(col("dist") <= maxDist)
      .select("a_id", "b_id", "a_val", "b_val", "dist")
  }
}
