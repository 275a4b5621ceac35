package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming right-to-be-forgotten — the control-stream counterpart of
  * the batch erasure gate (q191): the data stream and the erasure-command
  * stream arrive UNIONED (the standard control-channel pattern — one
  * keyed stream, a flag column), and an erasure command for a key
  *  1. PURGES the key's aggregate state immediately (not at TTL),
  *  2. emits one final `purged` row (the audit trail — silence would be
  *     indistinguishable from data loss),
  *  3. suppresses every subsequent AND late-arriving event of the key —
  *     erasure is retroactive, so arrival order cannot matter.
  *
  * After purge the only state left is the one-bit tombstone (the minimal
  * record that the key must stay dark — itself no longer user data).
  * Running (n, cents) snapshots emit per batch for live keys,
  * latest-`seq`-wins, so a downstream serving table converges to totals
  * for live keys and the purge row for erased ones (ErasureTwsSpec pins
  * parity with the batch aggregate over non-erased keys). */
object ErasureTws {

  case class Msg(key: String, tsMs: Long, isErasure: Boolean, cents: Long)
  case class Snap(key: String, n: Long, cents: Long, purged: Boolean,
      seq: Long, emittedAt: java.sql.Timestamp)

  private case class Agg(n: Long, cents: Long)

  class Processor extends StatefulProcessor[String, Msg, Snap] {
    @transient private var erased: ValueState[Boolean] = _
    @transient private var agg: ValueState[Agg] = _
    @transient private var seq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      erased = getHandle.getValueState[Boolean]("erased",
        Encoders.scalaBoolean, TTLConfig.NONE)
      agg = getHandle.getValueState[Agg]("agg",
        Encoders.product[Agg], TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def nextSeq(): Long = {
      val n = (if (seq.exists()) seq.get() else 0L) + 1L
      seq.update(n)
      n
    }

    override def handleInputRows(key: String, rows: Iterator[Msg],
        timerValues: TimerValues): Iterator[Snap] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      if (erased.exists() && erased.get()) return Iterator.empty
      val batch = rows.toSeq
      val relMs = math.max(batch.map(_.tsMs).max, wm + 1)
      if (batch.exists(_.isErasure)) {
        // retroactive: the whole batch is suppressed, state goes dark
        agg.clear()
        erased.update(true)
        return Iterator.single(Snap(key, 0L, 0L, purged = true,
          nextSeq(), new java.sql.Timestamp(relMs)))
      }
      val a0 = if (agg.exists()) agg.get() else Agg(0L, 0L)
      val a = batch.foldLeft(a0)((a, m) => Agg(a.n + 1L, a.cents + m.cents))
      agg.update(a)
      Iterator.single(Snap(key, a.n, a.cents, purged = false,
        nextSeq(), new java.sql.Timestamp(relMs)))
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Snap] =
      Iterator.empty
  }

  def snapshots(msgs: Dataset[Msg], watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[Snap] = {
    import spark.implicits._
    msgs
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Msg]
      .groupByKey(_.key)
      .transformWithState(new Processor, "emittedAt", OutputMode.Append())
  }
}
