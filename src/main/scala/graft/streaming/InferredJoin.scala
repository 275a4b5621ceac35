package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.{JoinSideEvent, JoinedPair}

/** Inferred-reference join (reference J1 core,
  * P:common/functions/inferred/BaseInferred.java):
  *
  * Streams are keyed by (platformId, logUserId). RHS (child) events join
  * their LHS (parent) by exact foreign key when present — including
  * out-of-order arrival, where the RHS waits for its LHS (the reference's
  * `ooIdJoin` buffer). RHS events *without* a foreign key wait out the
  * out-of-orderness bound, then are attributed to the temporally-closest
  * LHS within `[rightTs - maxTimeMs, rightTs + outOfOrderMs]` (the
  * reference's inference-scope fallback, BaseInferred.java:605-650).
  * Unmatched RHS events emit as matchType="dropped" (side-output channel).
  *
  * Scale design: state per key holds only (pk → ts) for live LHS events and
  * the pending RHS skeletons — the TinyEvent pattern — and every map is
  * pruned by watermark-driven TTL (`cleanupLefts`), mirroring the
  * reference's cleanup cascade (FlatOutputJob.java:808-882). State size is
  * bounded by events-in-window per (platform, logUser), never by stream
  * length.
  *
  * `joinBatch` runs identical logic over bounded data (the reference's
  * "run stream jobs as batch" testing trick, SURVEY §5).
  */
object InferredJoin {

  case class State(
      lefts: Map[String, Long], // LHS pk → event ts
      pendingFk: List[(String, String, Long)], // (rightId, fk, ts) awaiting LHS
      pendingInfer: List[(String, Long)]) // (rightId, ts) awaiting inference

  def emptyState: State = State(Map.empty, Nil, Nil)

  /** Pure per-key transition shared by batch and streaming: consume new
    * events, resolve everything resolvable at `watermarkMs`, return
    * (outputs, nextState). `watermarkMs = Long.MaxValue` resolves all. */
  def advance(key: (Long, String), events: Seq[JoinSideEvent], st: State,
      watermarkMs: Long, maxTimeMs: Long, outOfOrderMs: Long): (Seq[JoinedPair], State) = {
    val (platformId, logUserId) = key
    var lefts = st.lefts
    val out = Seq.newBuilder[JoinedPair]

    def emit(leftId: String, leftTs: Long, rightId: String, rightTs: Long, how: String): Unit =
      out += JoinedPair(platformId, logUserId, leftId, rightId, leftTs, rightTs, how)

    // 1. ingest LHS first (same-batch RHS may reference them)
    events.foreach { e =>
      if (e.side == 0 && !lefts.contains(e.id)) lefts += (e.id -> e.tsMs)
      // duplicate LHS pks are FIFO-deduped (reference BaseInferred:337-352)
    }

    // 2. ingest RHS: exact-FK fast path, else buffer
    var pendingFk = st.pendingFk
    var pendingInfer = st.pendingInfer
    events.foreach { e =>
      if (e.side == 1) {
        if (e.parentId.nonEmpty) {
          lefts.get(e.parentId) match {
            case Some(lts) => emit(e.parentId, lts, e.id, e.tsMs, "exact")
            case None => pendingFk ::= ((e.id, e.parentId, e.tsMs))
          }
        } else pendingInfer ::= ((e.id, e.tsMs))
      }
    }

    // 3. out-of-order FK joins: LHS may have arrived in this batch
    pendingFk = pendingFk.filter { case (rid, fk, rts) =>
      lefts.get(fk) match {
        case Some(lts) => emit(fk, lts, rid, rts, "exact"); false
        case None =>
          if (rts + outOfOrderMs <= watermarkMs) { // LHS will never come
            emit("", -1L, rid, rts, "dropped"); false
          } else true
      }
    }

    // 4. inference: RHS past the OOO bound picks the temporally-closest LHS
    //    in [rts - maxTime, rts + outOfOrder]; ties → earlier LHS, then pk.
    pendingInfer = pendingInfer.filter { case (rid, rts) =>
      if (rts + outOfOrderMs <= watermarkMs) {
        val candidates = lefts.toSeq.filter { case (_, lts) =>
          lts >= rts - maxTimeMs && lts <= rts + outOfOrderMs }
        if (candidates.isEmpty) emit("", -1L, rid, rts, "dropped")
        else {
          val (lid, lts) = candidates.minBy { case (id, ts) =>
            (math.abs(ts - rts), ts, id) }
          emit(lid, lts, rid, rts, "inferred")
        }
        false
      } else true
    }

    // 5. TTL cleanup: an LHS at lts can still match RHS with rts up to
    //    lts + maxTime, which resolves at rts + outOfOrder.
    if (watermarkMs != Long.MaxValue) {
      lefts = lefts.filter { case (_, lts) => lts + maxTimeMs + outOfOrderMs > watermarkMs }
    }

    (out.result(), State(lefts, pendingFk, pendingInfer))
  }

  /** Streaming form: union the two sides into JoinSideEvent, watermark on
    * event time, flatMapGroupsWithState with event-time timeouts. */
  def joinStream(events: Dataset[JoinSideEvent], watermarkDelay: String,
      maxTimeMs: Long, outOfOrderMs: Long)(implicit spark: SparkSession): Dataset[JoinedPair] = {
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[JoinSideEvent]
      .groupByKey(e => (e.platformId, e.logUserId))
      .flatMapGroupsWithState[State, JoinedPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[State]) =>
          val st = state.getOption.getOrElse(emptyState)
          val wm = state.getCurrentWatermarkMs()
          val (out, next) = advance(key, it.toSeq, st, wm, maxTimeMs, outOfOrderMs)
          if (next.lefts.isEmpty && next.pendingFk.isEmpty && next.pendingInfer.isEmpty) {
            state.remove()
          } else {
            state.update(next)
            // wake when the earliest pending RHS becomes resolvable
            val pendTs = (next.pendingFk.map(_._3) ++ next.pendingInfer.map(_._2))
            val nextFire = (pendTs.map(_ + outOfOrderMs) ++
              next.lefts.values.map(_ + maxTimeMs + outOfOrderMs)).min
            state.setTimeoutTimestamp(math.max(nextFire, wm + 1))
          }
          out.iterator
      }
  }

  /** Batch form: one pass per key, everything resolvable (watermark = ∞). */
  def joinBatch(events: Dataset[JoinSideEvent], maxTimeMs: Long,
      outOfOrderMs: Long)(implicit spark: SparkSession): Dataset[JoinedPair] = {
    import spark.implicits._
    events
      .groupByKey(e => (e.platformId, e.logUserId))
      .flatMapGroups { (key, it) =>
        // order by ts so FIFO-dedupe of duplicate LHS pks is deterministic
        val evs = it.toSeq.sortBy(e => (e.tsMs, e.side, e.id))
        advance(key, evs, emptyState, Long.MaxValue, maxTimeMs, outOfOrderMs)._1.iterator
      }
  }
}
