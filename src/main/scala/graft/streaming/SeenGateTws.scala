package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[SeenGate]] on Spark 4's `transformWithState` — the successor API to
  * flatMapGroupsWithState, and the one that may be CHAINED with further
  * stateful operators in a single streaming query (the FMGWS restriction
  * that forces one-stateful-stage-per-query goes away). This port is the
  * template for migrating the other stateful ops: the pure `advance`
  * logic maps onto typed state variables (ValueState/ListState) plus
  * explicit per-key timers, and the spec pins output parity against the
  * FMGWS form.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — also the production-scale
  * choice: state lives off-heap/on-disk, bounded only by local disk. */
object SeenGateTws {
  import SeenGate.{Event, Gated}

  class Processor extends StatefulProcessor[String, Event, Gated] {
    @transient private var seen: ValueState[Boolean] = _
    @transient private var delayed: ListState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)
      delayed = getHandle.getListState[(Long, String)]("delayed",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Gated] = {
      val out = Seq.newBuilder[Gated]
      rows.foreach { e =>
        if (e.side == 1) {
          if (!seen.exists()) seen.update(true)
        } else if (e.immediate) {
          out += Gated(key, e.id, e.tsMs)
        } else {
          delayed.appendValue((e.tsMs, e.id))
          // gate at the left's own timestamp, watermark-coordinated
          getHandle.registerTimer(
            math.max(e.tsMs, timerValues.getCurrentWatermarkInMs() + 1))
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Gated] = {
      val cutoff = expiredTimerInfo.getExpiryTimeInMs()
      val all = delayed.get().toList
      val (due, still) = all.partition(_._1 <= cutoff)
      delayed.clear()
      if (still.nonEmpty) delayed.appendList(still.toArray)
      if (seen.exists() && seen.get())
        due.sorted.iterator.map { case (ts, id) => Gated(key, id, ts) }
      else Iterator.empty
    }
  }

  def gateStream(events: Dataset[Event], watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[Gated] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
