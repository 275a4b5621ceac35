package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.schema.WindowAggResult

/** [[SlidingCounter]] on `transformWithState` — completes the tws ports of
  * the stateful family (seen-gate, last-seen, inferred join, redundant
  * reduce), so counter emission can CHAIN with further stateful stages in
  * one query (e.g. sliding counts feeding a top-k threshold gate). The
  * transition logic is [[SlidingCounter.advance]] verbatim; this wrapper
  * maps it onto typed state (a bucket MapState instead of the FMGWS state
  * case class — per-bucket point updates, no full-map rewrite per batch)
  * and explicit per-key timers at the emit cadence.
  *
  * Requires the RocksDB state store provider, as the other tws ports. */
object SlidingCounterTws {
  import SlidingCounter.{Event, State}

  /** Chained-query output: `emittedAt` is the RELEASE (tick) time, the
    * column a downstream stateful stage anchors its watermark on. */
  case class ResultAt(key: String, windowStartMs: Long, windowSizeMs: Long,
      count: Long, emittedAt: java.sql.Timestamp)

  class Processor(emitMs: Long, windowsMs: Seq[Long])
      extends StatefulProcessor[String, Event, ResultAt] {
    @transient private var buckets: MapState[Long, Long] = _
    @transient private var lastEmit: ValueState[Long] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buckets = getHandle.getMapState[Long, Long]("buckets",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      lastEmit = getHandle.getValueState[Long]("lastEmit",
        Encoders.scalaLong, TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** One timer outstanding per key: next emit tick (clamped above the
      * watermark so it can actually fire). */
    private def armTimer(wmMs: Long): Unit = {
      val next = math.max(lastEmit.get() + emitMs, wmMs + 1)
      if (timerAt.exists() && timerAt.get() != next)
        getHandle.deleteTimer(timerAt.get())
      if (!timerAt.exists() || timerAt.get() != next) {
        getHandle.registerTimer(next)
        timerAt.update(next)
      }
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ResultAt] = {
      var minBucket = Long.MaxValue
      rows.foreach { e =>
        val b = ((e.tsMs + emitMs - 1) / emitMs) * emitMs // ceil-aligned
        buckets.updateValue(b,
          (if (buckets.containsKey(b)) buckets.getValue(b) else 0L) + e.n)
        if (b < minBucket) minBucket = b
      }
      // first sight of the key: anchor the cadence one tick before the
      // earliest bucket (advance's lastEmitMs==0 convention)
      if (!lastEmit.exists() && minBucket != Long.MaxValue)
        lastEmit.update(minBucket - emitMs)
      armTimer(timerValues.getCurrentWatermarkInMs())
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ResultAt] = {
      timerAt.clear()
      val wm = timerValues.getCurrentWatermarkInMs()
      val st = State(buckets.iterator().map(kv => kv._1 -> kv._2).toMap,
        if (lastEmit.exists()) lastEmit.get() else 0L)
      val (out, next) = SlidingCounter.advance(key, Nil, st, wm, emitMs, windowsMs)
      // point-rewrite the bucket map: advance only ever DROPS buckets here
      st.buckets.keysIterator.filterNot(next.buckets.contains)
        .foreach(buckets.removeKey)
      lastEmit.update(next.lastEmitMs)
      if (next.buckets.isEmpty) {
        buckets.clear(); lastEmit.clear()
      } else armTimer(wm)
      out.iterator.map(r => ResultAt(r.key, r.windowStartMs, r.windowSizeMs,
        r.count, new java.sql.Timestamp(
          math.max(r.windowStartMs + r.windowSizeMs, wm + 1))))
    }
  }

  /** FMGWS-parity form (drops the chaining column). */
  def countStream(events: Dataset[Event], watermarkDelay: String,
      emitMs: Long, windowsMs: Seq[Long])(
      implicit spark: SparkSession): Dataset[WindowAggResult] = {
    import spark.implicits._
    countStreamChained(events, watermarkDelay, emitMs, windowsMs)
      .select(col("key"), col("windowStartMs"), col("windowSizeMs"),
        col("count").as("count")).as[WindowAggResult]
  }

  /** Chainable form: output watermark rides `emittedAt`. */
  def countStreamChained(events: Dataset[Event], watermarkDelay: String,
      emitMs: Long, windowsMs: Seq[Long])(
      implicit spark: SparkSession): Dataset[ResultAt] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.key)
      .transformWithState(new Processor(emitMs, windowsMs), "emittedAt",
        OutputMode.Append())
  }
}
