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
  * Skew note: a scorching-hot q-gram (e.g. "aaa" in synthetic data)
  * concentrates its join group; production deployments over adversarial
  * text should pre-salt the gram join or drop ultra-hot grams and weaken
  * the per-pair bound by each side's dropped-gram count (exactness-
  * preserving). Not needed for name-like domains.
  *
  * Output: (a_id, b_id, a_val, b_val, dist), a_id < b_id, dist ≤ maxDist.
  */
object FuzzyJoin {

  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      q: Int, maxDist: Int): DataFrame = {
    require(q >= 2 && maxDist >= 1, s"q=$q maxDist=$maxDist out of range")
    val base = df.select(col(idCol).cast("long").as("id"),
        col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val minBlockableLen = q * maxDist + q // bound > 0 ⇔ len−q+1 > q·d
    val long = base.where(col("len") >= minBlockableLen)
    val short = base.where(col("len") < minBlockableLen)

    // grams: overlapping substrings of length q, with multiplicity —
    // the count bound is on gram OCCURRENCES, so no distinct here.
    val grams = long.select(col("id"), col("len"),
        explode(expr(s"transform(sequence(1, len - $q + 1), " +
          s"i -> substring(s, i, $q))")).as("g"))
    val a = grams.as("a"); val b = grams.as("b")
    val blocked = a.join(b,
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .agg(count(lit(1)).as("shared"))
      // shared counts gram-PAIRS; a string's gram can match several of
      // the other's. That only over-counts, and the bound is a lower
      // bound on true common occurrences — still exactness-preserving.
      .where(col("shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(q * maxDist))
      .select("a_id", "b_id")

    // Short strings pair against EVERYTHING within the length filter
    // (including long partners just over the blockable boundary — pairs
    // the gram tier can't see because one side has no positive bound).
    // Both-short pairs arrive twice (once per side) — normalize + distinct.
    val shortPairs = short.as("a").join(base.as("b"),
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
