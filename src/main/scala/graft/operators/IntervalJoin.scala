package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-key + event-time-range joins ("interval joins").
  *
  * Semantics of the exact-key fast path of the reference's inferred joins:
  * RHS events within `[lhsTs + lowMs, lhsTs + highMs]` on the same key
  * (P:common/functions/inferred/BaseInferred.java:394-481; window defaults
  * BASELINE.md: view→insertion [-10m,0], insertion→impression [-30m,0],
  * impression→action [-1d,0]).
  *
  * Scale: Spark plans this as a hash/sort-merge join on the equi keys with
  * the range as a post-join filter — the shuffle is on the key, so work per
  * executor is bounded by key cardinality, not the time span. For extreme
  * per-key densities the reference notes interval joins degrade
  * superlinearly with duplicate ids (pipeline/README.md:291-304); the
  * mitigation at 100 TB is coarse time-bucketing both sides (bucket equality
  * added to the join key), which `bucketedRangeJoin` implements.
  */
object IntervalJoin {

  /** Left join counting RHS rows per LHS row within the window (zero-safe). */
  def countInRange(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsMs: String, rightTsMs: String, lowMs: Long, highMs: Long,
      leftId: String, countName: String): DataFrame = {
    val l = left.as("l")
    val r = right.as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val rangeCond = col(s"r.$rightTsMs") >= col(s"l.$leftTsMs") + lowMs &&
      col(s"r.$rightTsMs") <= col(s"l.$leftTsMs") + highMs
    l.join(r, keyCond && rangeCond, "left")
      .groupBy((Seq(leftId, leftTsMs) ++ keys).map(c => col(s"l.$c").as(c)): _*)
      .agg(count(col(s"r.$rightTsMs")).as(countName))
  }

  /** Inner range join with a coarse time-bucket equality folded into the join
    * key — the 100 TB-safe shape: each side is bucketed to `ceil(high-low)`
    * so a probe only meets candidate buckets, never a whole skewed key. */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsMs: String, rightTsMs: String, lowMs: Long, highMs: Long): DataFrame = {
    val span = math.max(highMs - lowMs, 1L)
    // A right row at rt joins left rows with lt in [rt-high, rt-low]; with
    // bucket size = span, each right row lands in <= 2 + ceil(span/span)
    // candidate left buckets, enumerated below.
    val lb = left.withColumn("__b", (col(leftTsMs) / span).cast("long"))
    val rb = right.withColumn("__bs",
      sequence((((col(rightTsMs) - highMs) / span).cast("long")),
        (((col(rightTsMs) - lowMs) / span).cast("long"))))
      .withColumn("__b", explode(col("__bs"))).drop("__bs")
    val keyCond = (keys :+ "__b").map(k => lb(k) === rb(k)).reduce(_ && _)
    val rangeCond = rb(rightTsMs) >= lb(leftTsMs) + lowMs &&
      rb(rightTsMs) <= lb(leftTsMs) + highMs
    lb.join(rb, keyCond && rangeCond, "inner").drop("__b")
  }

  /** Per-key interval-union coverage — merge overlapping/touching
    * [start, end) intervals and report how much of the timeline each key
    * actually covers (the "active time" metric billing/engagement
    * pipelines compute, and the sweep every SLA-coverage audit runs).
    * Gaps-and-islands form (classic SQL technique): an interval starts a
    * new island iff its start exceeds the running max end of all earlier
    * intervals of the key; island id = running count of starts. All
    * integer-ms arithmetic — hash-gateable.
    *
    * Scale: two window passes and one aggregation, all partitioned by
    * `keys` — a single shuffle of (key, start, end) triples, O(1) state
    * per row (the running-max frame is cumulative, not buffered).
    * Output: keys ++ (n_intervals, n_islands, covered_ms). */
  def unionCoverage(df: DataFrame, keys: Seq[String],
      startMs: String, endMs: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startMs), col(endMs))
    val prevMax = max(col(endMs))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = df
      .withColumn("__new",
        when(prevMax.isNull || col(startMs) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy((keys :+ "__island").map(col): _*)
      .agg(count(lit(1)).as("n"),
        (max(col(endMs)) - min(col(startMs))).as("len"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("len")).as("covered_ms"))
  }
}
