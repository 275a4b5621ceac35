package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each user, the earliest strictly-ordered
  * traversal of a stage sequence (view → click → purchase …) completed
  * within `windowMs` of the first stage — the conversion query every
  * product-metrics engine ships (cf. the reference's joined-event
  * attribution family; reference semantics context at
  * `/root/reference/pipeline/README.md:11-15`).
  *
  * Semantics (the "earliest completion" greedy): t₁ = the user's first
  * stage-1 event; tᵢ = the first stage-i event strictly after tᵢ₋₁ and
  * within `windowMs` of t₁. Greedy-earliest is the standard funnel
  * definition and is NOT the same as "any ordered subsequence" — a later
  * t₁ can never produce an earlier completion because stage times are
  * minima under an increasing lower bound.
  *
  * Shape: ONE shuffle on the user key; stage times fold per user inside a
  * single aggregation (conditional mins, stage i gated on stage i−1), no
  * self-joins, no window sort. min(CASE…) is a partial aggregate, so the
  * per-stage candidates combine map-side — but stage i's gate needs stage
  * i−1's FINAL time, so each stage is one aggregation pass; funnels are
  * short (3–5 stages), and all passes reuse the same shuffle partitioning
  * (no extra exchange after the first).
  *
  * Output: one row per user that reached stage 1 —
  * (userCol, t1..tN nullable epoch-ms, stages_reached). */
object Funnel {

  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], windowMs: Long): DataFrame = {
    require(stages.nonEmpty)
    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      col(tsCol).cast("long").as("ts"))
      // pre-filter to funnel stages: the shuffle carries only relevant rows
      .where(col("et").isin(stages: _*))
      .repartition(col("u"))
    // stage 1: the user's first occurrence
    var acc = base.groupBy(col("u"))
      .agg(min(when(col("et") === stages.head, col("ts"))).as("t1"))
      .where(col("t1").isNotNull)
    // stage i: first occurrence strictly after t_{i-1}, within windowMs of t1
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = col(s"t${i}")
      acc = base.join(acc, "u")
        .groupBy((col("u") +: (1 to i).map(j => col(s"t$j"))): _*)
        .agg(min(when(col("et") === st && prev.isNotNull &&
          col("ts") > prev && col("ts") <= col("t1") + windowMs,
          col("ts"))).as(s"t${i + 1}"))
    }
    val reached = stages.indices.map(i =>
      when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select(col("u").as(userCol) +:
      stages.indices.map(i => col(s"t${i + 1}")) :+
      reached.cast("long").as("stages_reached"): _*)
  }

  /** Stage-level rollup: how many users reached each stage. */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String], windowMs: Long): DataFrame = {
    val t = funnelTimes(events, userCol, typeCol, tsCol, stages, windowMs)
    val arms = stages.zipWithIndex.map { case (st, i) =>
      // coalesce: sum over ZERO rows (nobody reached stage 1) is NULL
      (i + 1, st,
        coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L)))
    }
    t.agg(arms.head._3.as("c1"),
        arms.tail.map { case (i, _, c) => c.as(s"c$i") }: _*)
      .select(explode(array(arms.map { case (i, st, _) =>
        struct(lit(i).cast("long").as("stage"), lit(st).as("stage_name"),
          col(s"c$i").as("users"))
      }: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_name"), col("s.users"))
  }

  /** First-order Markov transition matrix over per-user event paths —
    * the clickstream "what happens after X" census (the path-analysis
    * complement of the ordered funnel: funnels test ONE hypothesized
    * sequence, transitions surface every observed hop).
    *
    * Each user's events order by (ts, tie-break col); consecutive pairs
    * count into (from_type, to_type) cells with row probabilities as
    * exact integer millionths — (cnt · 1e6) div row-total, truncating —
    * so the matrix hash-gates cross-engine (a double ratio would not).
    *
    * Shape: one shuffle to order within user keys (the lead window),
    * then a bounded groupBy on |event types|² cells with map-side
    * partial counts. */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(userCol), col(tsCol), col(tieCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("row_total"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("(cnt * 1000000) div row_total").as("prob_e6"))
  }

  /** Length-3 behavior paths ([[transitions]] one hop deeper — the
    * sequence-mining census "view→click→purchase happens N times"):
    * consecutive event-type triples per user in (ts, tie) order, both
    * hops gap-bounded so a path never spans an idle break. Same shape
    * as transitions: ONE window sort per user partition (two leads ride
    * the same sort), then a counting aggregation over at most
    * |vocabulary|³ path keys — the census, not the rows, reaches the
    * final shuffle. */
  def pathTrigrams(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, maxGapMs: Long): DataFrame = {
    require(maxGapMs > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .withColumn("ts2", lead(col(tsCol), 1).over(w))
      .withColumn("ts3", lead(col(tsCol), 2).over(w))
      .where(col("t3").isNotNull &&
        col("ts2") - col(tsCol) <= maxGapMs &&
        col("ts3") - col("ts2") <= maxGapMs)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("cnt"))
  }
}
