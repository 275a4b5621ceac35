package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.ScopedEvent
import InferredJoinTws.JoinedPairAt

/** The multi-stage streaming flat chain as ONE query — the reference runs
  * view→insertion→impression→action as a single Flink program
  * (FlatOutputJob.java:368-641); with `transformWithState` chaining, the
  * Spark form is likewise a single streaming query: each stage's pairs are
  * enriched (stream-static) into the next stage's LHS, the next stage's
  * RHS stream unions in under its own watermark (global watermark = min
  * across sources), and the next inferred join consumes the union keyed by
  * (platformId, logUserId).
  *
  * Stage plumbing rules (the two that make chaining work at all):
  *  - the inter-stage event-time column is the upstream stage's
  *    `emittedAt` RELEASE time, never the original event time (which ends
  *    up arbitrarily far behind the global watermark — a fresh
  *    withWatermark node on it would idle at zero and deadlock timers);
  *  - the raw RHS stream carries its own `emittedAt` = its event time with
  *    a watermark node applied BEFORE the union, so both union branches
  *    present the same time column to the downstream join.
  *
  * FlatChainTwsSpec pins two-stage parity against the batch chain
  * (`InferredJoin.joinScopedBatch` twice — the composition q35 gates). */
object FlatChainTws {

  /** One follow-on stage: map the upstream pairs into stage-N LHS rows
    * (keep `emittedAt`!), union the stage-N RHS stream, join again.
    *
    * `toLeft` receives the upstream [[JoinedPairAt]] frame and must return
    * ScopedEvent-shaped columns (side 0) PLUS the `emittedAt` column it
    * was given — enrichment joins against static/broadcast tables are fine
    * (stream-static joins preserve the watermark). */
  def nextStage(upstream: Dataset[JoinedPairAt],
      toLeft: DataFrame => DataFrame,
      rhs: Dataset[ScopedEvent], rhsWatermarkDelay: String,
      maxTimeMs: Long, outOfOrderMs: Long, rightOuter: Boolean)(
      implicit spark: SparkSession): Dataset[JoinedPairAt] = {
    import spark.implicits._
    val left = toLeft(upstream.toDF())
    val right = rhs.toDF()
      .withColumn("emittedAt", timestamp_millis(col("tsMs")))
      .withWatermark("emittedAt", rhsWatermarkDelay)
    val cols = Seq("platformId", "logUserId", "side", "id", "parentId",
      "tsMs", "scopes", "contentIds", "emittedAt")
    InferredJoinTws.joinScopedChained(
      left.select(cols.map(col): _*)
        .unionByName(right.select(cols.map(col): _*))
        .as[ScopedEvent],
      maxTimeMs, outOfOrderMs, rightOuter)
  }

  /** D3 as the chain's final stage (reference wiring: reduce AFTER both
    * join stages, FlatOutputJob.java:611-624): impression pairs (stage 2
    * output: leftId = insertionId, rightId = impressionId) union action
    * pairs (stage 3 output: leftId = impressionId, rightId = actionId,
    * optionally `sep`-packed with a cart item content id) feed
    * [[RedundantReduceTws.reduceChained]]. Outer/dropped pairs are
    * filtered — only real joins participate in the reduction.
    *
    * Plan note: `impPairs` also feeds stage 3's LHS, and Spark plans are
    * trees, not DAGs — the shared stage-2 subtree is DUPLICATED into both
    * branches (each copy deterministic and separately checkpointed, so
    * results and recovery are correct, but stages 1-2 hold state twice).
    * The reference's Flink DAG shares the node; at production scale you'd
    * split at the share point into two queries over an intermediate sink
    * (the reference materializes its flat tables anyway), or accept the
    * 2× for the one-query form this proves out. */
  def reduceStage(impPairs: Dataset[JoinedPairAt],
      actPairs: Dataset[JoinedPairAt], sep: String, oooMs: Long,
      replaceTtlMs: Long, cleanupMs: Long)(
      implicit spark: SparkSession): Dataset[RedundantReduceTws.Reduced] = {
    import spark.implicits._
    def matched(df: DataFrame) =
      df.where(col("matchType").isin("exact", "inferred"))
    val imps = matched(impPairs.toDF()).select(
      col("platformId"), col("logUserId"),
      col("leftId").as("insertionId"), col("rightId").as("impressionId"),
      lit("").as("actionId"), lit("").as("contentId"),
      col("rightTs").as("tsMs"), col("emittedAt"))
    val acts = matched(actPairs.toDF()).select(
      col("platformId"), col("logUserId"), lit("").as("insertionId"),
      col("leftId").as("impressionId"),
      when(col("rightId").contains(sep),
        substring_index(col("rightId"), sep, 1))
        .otherwise(col("rightId")).as("actionId"),
      when(col("rightId").contains(sep),
        substring_index(col("rightId"), sep, -1))
        .otherwise(lit("")).as("contentId"),
      col("rightTs").as("tsMs"), col("emittedAt"))
    RedundantReduceTws.reduceChained(
      imps.unionByName(acts).as[RedundantReduceTws.TinyJoined],
      oooMs, replaceTtlMs, cleanupMs)
  }
}
