package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation shapes.
  *
  * For ALGEBRAIC aggregates (sum/count/min/max) Spark's partial
  * aggregation already neutralizes key skew — every partition combines
  * locally before the exchange, so a hot key ships one partial per
  * partition, not its rows. The patterns here cover what partials do
  * NOT fix:
  *
  *  - [[exactDistinctPregrouped]] — exact COUNT(DISTINCT) as two
  *    hash aggregations: pre-group on (keys, value) — this is the
  *    "salt by the value itself" trick, a hot key's distinct work
  *    spreads across the cluster by value — then count per key.
  *    Catalyst's own single-pass planning of one distinct agg is the
  *    same shape, but MIXED distinct+plain aggregates trigger the
  *    Expand rewrite (k× the input); this form never does, and at
  *    100 TB "never Expand the fact table" is the difference between
  *    a job and an outage. See ApproxDistinctRewrite for the sketch
  *    alternative when ±1% is acceptable.
  *  - [[saltedHolistic]] — generic two-phase split for MERGEABLE
  *    holistic state (here: collect_set capped), salting the first
  *    phase by a content hash so a hot key's state builds in
  *    `salts` shards before the per-key merge. */
object SkewAgg {

  /** Exact per-key distinct + row counts, Expand-free: (keys...,
    * n_rows, n_distinct). */
  def exactDistinctPregrouped(df: DataFrame, keys: Seq[String],
      value: Column): DataFrame = {
    val pre = df.select(keys.map(col) :+ value.as("__v"): _*)
      .groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__n"))
    pre.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"), count(lit(1)).as("n_distinct"))
  }

  /** Two-phase salted distinct-set build: phase 1 collects per
    * (keys, salt) shard sets, phase 2 unions the ≤`salts` shard sets
    * per key. Deterministic output: the merged set is sorted. */
  def saltedHolistic(df: DataFrame, keys: Seq[String], value: Column,
      salts: Int): DataFrame = {
    require(salts >= 1)
    val salted = df.select(keys.map(col) :+ value.as("__v"): _*)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(salts)))
    val shard = salted.groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(collect_set(col("__v")).as("__shard"))
    shard.groupBy(keys.map(col): _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("__shard")))))
        .as("distinct_values"))
  }
}
