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
}
