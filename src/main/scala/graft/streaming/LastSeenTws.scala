package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[LastSeen]] on `transformWithState` — the second stateful-op port
  * after [[SeenGateTws]], proving the migration template extends to
  * TIMER-DRIVEN DECAY: day buckets live in a typed MapState, each new day
  * registers its hash-spread cleanup timer, and expiry re-emits the
  * shrunken count. Emission parity with the FMGWS form is exact because
  * both paths prune by the CURRENT WATERMARK (not the timer's expiry
  * time): when events and timers land in one micro-batch, the input path
  * prunes first and the timer then finds nothing due — collapsing to the
  * single refresh the FMGWS `advance` emits (LastSeenTwsSpec pins this).
  *
  * `ResultAt.emittedAt` is the release-time column for chaining further
  * stateful stages via the `eventTimeColumnName` overload (same
  * watermark-re-assignment mechanism as [[SeenGateTws.GatedAt]]).
  *
  * Requires the RocksDB state store provider, as all tws ops do. */
object LastSeenTws {
  import LastSeen.{Event, Result, cleanupTime, emittedTtlSec}

  case class ResultAt(key: String, lastTsMs: Long, count: Long, ttlSec: Long,
      seq: Long, emittedAt: java.sql.Timestamp)

  class Processor(ttlDays: Int)
      extends StatefulProcessor[String, Event, ResultAt] {
    @transient private var lastTs: ValueState[Long] = _
    @transient private var seq: ValueState[Long] = _
    @transient private var days: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastTs = getHandle.getValueState[Long]("lastTs",
        Encoders.scalaLong, TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq",
        Encoders.scalaLong, TTLConfig.NONE)
      days = getHandle.getMapState[Long, Long]("days",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    }

    private def liveCount(): Long = {
      var s = 0L
      val it = days.iterator()
      while (it.hasNext) s += it.next()._2
      s
    }

    private def nextSeq(): Long = {
      val n = (if (seq.exists()) seq.get() else 0L) + 1L
      seq.update(n)
      n
    }

    /** Drop every day bucket whose spread cleanup time the watermark has
      * passed; true when anything dropped. */
    private def prune(key: String, wmMs: Long): Boolean = {
      if (wmMs == Long.MinValue) return false
      val due = days.iterator().map(_._1)
        .filter(d => cleanupTime(key.hashCode, d, ttlDays) <= wmMs)
        .toList
      due.foreach(days.removeKey)
      due.nonEmpty
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ResultAt] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val ttlSec = emittedTtlSec(ttlDays)
      val out = Seq.newBuilder[ResultAt]
      rows.toSeq.sortBy(_.tsMs).foreach { e =>
        lastTs.update(e.tsMs)
        val day = e.tsMs - math.floorMod(e.tsMs, 86400000L)
        if (!days.containsKey(day)) {
          days.updateValue(day, 1L)
          getHandle.registerTimer(
            math.max(cleanupTime(key.hashCode, day, ttlDays), wm + 1))
        } else days.updateValue(day, days.getValue(day) + 1L)
        out += ResultAt(key, e.tsMs, liveCount(), ttlSec, nextSeq(),
          new java.sql.Timestamp(math.max(e.tsMs, wm + 1)))
      }
      if (prune(key, wm))
        out += ResultAt(key, lastTs.get(), liveCount(), ttlSec, nextSeq(),
          new java.sql.Timestamp(math.max(lastTs.get(), wm + 1)))
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ResultAt] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      if (prune(key, wm)) {
        val lt = if (lastTs.exists()) lastTs.get() else 0L
        Iterator.single(ResultAt(key, lt, liveCount(),
          emittedTtlSec(ttlDays), nextSeq(),
          new java.sql.Timestamp(math.max(lt, wm + 1))))
      } else Iterator.empty
    }
  }

  /** FMGWS-parity form (drops the chaining column). */
  def countStream(events: Dataset[Event], watermarkDelay: String,
      ttlDays: Int = 90)(implicit spark: SparkSession): Dataset[Result] = {
    import spark.implicits._
    countStreamChained(events, watermarkDelay, ttlDays)
      .select(col("key"), col("lastTsMs"), col("count"), col("ttlSec"),
        col("seq")).as[Result]
  }

  /** Chainable form: output watermark rides `emittedAt`. */
  def countStreamChained(events: Dataset[Event], watermarkDelay: String,
      ttlDays: Int = 90)(implicit spark: SparkSession): Dataset[ResultAt] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.key)
      .transformWithState(new Processor(ttlDays), "emittedAt",
        OutputMode.Append())
  }
}
