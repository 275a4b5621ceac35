package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming running OLS trend — the continuous form of
  * [[graft.operators.Trend.groupedOls]]. Unlike the CUSUM fold, the five
  * OLS sufficient statistics are COMMUTATIVE (plain sums), so no reorder
  * buffer and no watermark gating are needed: every arrival folds
  * immediately, out-of-order or not, and the running ratio is exact at
  * every emission — the streaming≡batch parity is unconditional, not
  * watermark-dependent (TrendTwsSpec pins final state against the batch
  * operator bit-for-bit).
  *
  * State per key: five longs + an emission counter — O(1), no TTL needed
  * for bounded key families (callers with unbounded keys wrap the state
  * in a TTLConfig the same way [[AttributionTws]] does). Emission: one
  * summary per key per microbatch that touched it (the running-readout
  * cadence), stamped with the fold count so downstream consumers dedup
  * to the latest. */
object TrendTws {

  case class Obs(key: String, x: Long, y: Long)
  case class Fit(key: String, n: Long, sumX: Long, sumY: Long,
      slopeNum: Long, slopeDen: Long, interceptNum: Long)

  private case class Stats(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long)

  class Processor extends StatefulProcessor[String, Obs, Fit] {
    @transient private var st: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Stats]("stats", Encoders.product[Stats],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Fit] = {
      var s = if (st.exists()) st.get() else Stats(0L, 0L, 0L, 0L, 0L)
      rows.foreach { o =>
        s = Stats(s.n + 1, s.sx + o.x, s.sy + o.y, s.sxy + o.x * o.y,
          s.sxx + o.x * o.x)
      }
      st.update(s)
      Iterator.single(Fit(key, s.n, s.sx, s.sy,
        s.n * s.sxy - s.sx * s.sy,
        s.n * s.sxx - s.sx * s.sx,
        s.sy * s.sxx - s.sx * s.sxy))
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Fit] = Iterator.empty
  }

  /** Fold a keyed observation stream into running per-key OLS fits. */
  def fit(obs: Dataset[Obs])(implicit spark: SparkSession): Dataset[Fit] = {
    import spark.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new Processor, org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
