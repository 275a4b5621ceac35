package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming interval-union coverage — the `transformWithState` port of
  * [[graft.operators.IntervalJoin.unionCoverage]]: per key, maintain the
  * merged-island set incrementally and emit a refreshed
  * (n_intervals, n_islands, covered_ms) snapshot per input batch
  * (latest-`seq`-wins, the counter-family convention).
  *
  * The 100 TB state discipline is the point: islands whose `end` has
  * fallen strictly behind the watermark can NEVER change again — any
  * interval that could merge into one would need `start ≤ end < wm`,
  * and the tws late filter drops every input with `eventTime ≤ wm`
  * (note ≤, and the INITIAL watermark is epoch 0, not −∞ —
  * CoverageTwsSpec pins both) — so they FREEZE
  * into three accumulator longs and leave state. Live state per key is
  * therefore the open islands inside the watermark horizon (bounded by
  * delay ÷ interval length), not the key's history: day-one and day-400
  * of a stream hold the same state size.
  *
  * Emission parity with the batch form is exact (CoverageTwsSpec pins
  * it): same strict `start > running-max-end` island rule, same integer
  * arithmetic, and freezing only commutes island counts into the
  * accumulator — totals are invariant to WHEN freezing happens. */
object CoverageTws {

  case class Iv(key: String, startMs: Long, endMs: Long)
  case class Coverage(key: String, nIntervals: Long, nIslands: Long,
      coveredMs: Long, seq: Long, emittedAt: java.sql.Timestamp)

  /** (start, end, member count) of one open merged island. */
  case class Island(start: Long, end: Long, n: Long)
  /** (intervals, islands, coveredMs) already frozen out of live state. */
  case class Frozen(n: Long, islands: Long, covered: Long)

  class Processor extends StatefulProcessor[String, Iv, Coverage] {
    @transient private var open: ListState[Island] = _
    @transient private var frozen: ValueState[Frozen] = _
    @transient private var seq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getListState[Island]("open",
        Encoders.product[Island], TTLConfig.NONE)
      frozen = getHandle.getValueState[Frozen]("frozen",
        Encoders.product[Frozen], TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Iv],
        timerValues: TimerValues): Iterator[Coverage] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val incoming = rows.map(r => Island(r.startMs, r.endMs, 1L)).toSeq
      if (incoming.isEmpty) return Iterator.empty
      // merge = one sorted sweep over (existing open ∪ new), the exact
      // batch island rule; open-island counts stay small (horizon-bound)
      val all = (open.get().toSeq ++ incoming)
        .sortBy(i => (i.start, i.end))
      val merged = Seq.newBuilder[Island]
      var cur: Island = null
      all.foreach { i =>
        if (cur == null) cur = i
        else if (i.start > cur.end) { merged += cur; cur = i }
        else cur = Island(cur.start, math.max(cur.end, i.end), cur.n + i.n)
      }
      if (cur != null) merged += cur
      var f = if (frozen.exists()) frozen.get() else Frozen(0L, 0L, 0L)
      val (dead, live) =
        if (wm == Long.MinValue) (Seq.empty[Island], merged.result())
        else merged.result().partition(_.end < wm)
      dead.foreach { i =>
        f = Frozen(f.n + i.n, f.islands + 1L, f.covered + (i.end - i.start))
      }
      frozen.update(f)
      open.put(live.toArray)
      val n = f.n + live.map(_.n).sum
      val isl = f.islands + live.size
      val cov = f.covered + live.map(i => i.end - i.start).sum
      val s = (if (seq.exists()) seq.get() else 0L) + 1L
      seq.update(s)
      // release time: past every interval end seen and the watermark —
      // the refresh is a correction row, not an event
      val relMs = (incoming.map(_.end) ++ live.map(_.end)).max.max(wm + 1)
      Iterator.single(Coverage(key, n, isl, cov, s,
        new java.sql.Timestamp(relMs)))
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Coverage] =
      Iterator.empty
  }

  /** Append-mode coverage refresh stream; event time = interval start. */
  def coverageStream(intervals: Dataset[Iv], watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[Coverage] = {
    import spark.implicits._
    intervals
      .withColumn("eventTime", timestamp_millis(col("startMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Iv]
      .groupByKey(_.key)
      .transformWithState(new Processor, "emittedAt",
        OutputMode.Append())
  }
}
