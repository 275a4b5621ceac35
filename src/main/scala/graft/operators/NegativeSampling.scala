package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for recommender / retrieval
  * training sets (the BPR / word2vec-style negatives every two-tower
  * trainer consumes): for each user, draw k pseudo-random item ids,
  * reject the ones the user actually interacted with, keep the first k
  * survivors.
  *
  * Determinism: the draw is a Lehmer LCG step mod the Mersenne prime
  * 2³¹−1 — x = (48271·seed) mod p, seed = (user·65537 + slot + 1)
  * mod p — chosen because every intermediate fits LONG WITHOUT
  * wrap-around (a·x < 2⁶²): Spark would wrap silently on overflow
  * while DuckDB raises, so wrap-free modular arithmetic is the only
  * portable PRNG. Same closed form replays in SQL; no engine RNG, no
  * seeds-by-partition nondeterminism, resample-stable across runs and
  * cluster layouts.
  *
  * Scale shape: one explode of `oversample·k` slots per user (the only
  * row blowup, linear and caller-bounded), one LEFT ANTI join on
  * (user, item) against interactions (ordinary shuffle join — the
  * candidate side is already user-keyed), one user-partitioned window
  * to rank surviving slots. No global sort, no collect.
  *
  * Collisions: two slots can draw the same item — survivors dedupe to
  * the lowest slot first (the window orders by slot), so the output is
  * ≤ k DISTINCT negatives per user; under-filled users (pathological
  * coverage or tiny nItems) return fewer than k rather than looping —
  * callers needing exactly k raise `oversample`.
  *
  * Output: (user, item, slot) — one row per kept negative. */
object NegativeSampling {

  private val P = 2147483647L // 2^31 - 1

  def negativeSample(interactions: DataFrame, userCol: Column,
      itemCol: Column, nItems: Long, k: Int,
      oversample: Int = 4): DataFrame = {
    require(nItems > 0 && nItems <= P, s"nItems=$nItems out of (0, 2^31)")
    require(k >= 1 && oversample >= 1 && k.toLong * oversample <= 4096,
      s"k=$k × oversample=$oversample out of (0, 4096]")
    val inter = interactions
      .select(userCol.cast("long").as("user"), itemCol.cast("long").as("item"))
      .where(col("user").isNotNull && col("item").isNotNull)
    val users = inter.select(col("user")).distinct()
    val cand = users
      .select(col("user"),
        explode(sequence(lit(0L), lit((k * oversample - 1).toLong)))
          .as("slot"))
      .withColumn("item", expr(
        s"((48271 * (((user % $P) * 65537 + slot + 1) % $P)) % $P)" +
          s" % $nItems"))
    val negatives = cand.join(inter, Seq("user", "item"), "left_anti")
    // keep the first k DISTINCT surviving items per user, lowest slot
    // wins a collision — both windows share the one user partition
    val w = Window.partitionBy(col("user"))
    negatives
      .withColumn("__first", min(col("slot"))
        .over(w.partitionBy(col("user"), col("item"))))
      .where(col("slot") === col("__first"))
      .withColumn("__r", row_number().over(w.orderBy(col("slot"))))
      .where(col("__r") <= k)
      .select(col("user"), col("item"), col("slot"))
  }
}
