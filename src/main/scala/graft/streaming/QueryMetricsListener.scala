package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability: a [[StreamingQueryListener]] that folds each
  * progress report into a bounded in-memory ring — the state-size /
  * watermark-lag / throughput telemetry a production streaming job ships
  * to its metrics system (the reference jobs export the Flink
  * equivalents; here the hook is the Spark listener bus).
  *
  * Captured per microbatch: query name, batch id, input rows, processed
  * rows/sec, total STATE rows and state memory across stateful
  * operators, and the event-time watermark. The ring is bounded
  * (`keep`), so an always-on listener cannot leak; reads snapshot the
  * deque without blocking the listener bus thread. Register with
  * `spark.streams.addListener(l)`; driver-side only, no executor state. */
class QueryMetricsListener(keep: Int = 256) extends StreamingQueryListener {
  require(keep >= 1)

  final case class BatchMetrics(queryName: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double,
      stateRows: Long, stateMemoryBytes: Long, watermark: String)

  private val ring = new ConcurrentLinkedDeque[BatchMetrics]()
  @volatile private var started = 0L
  @volatile private var terminated = 0L

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    started += 1

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateMem = p.stateOperators.map(_.memoryUsedBytes).sum
    ring.addLast(BatchMetrics(
      Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      p.processedRowsPerSecond, stateRows, stateMem,
      Option(p.eventTime.get("watermark")).getOrElse("")))
    while (ring.size() > keep) ring.pollFirst()
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminated += 1

  /** Snapshot of the retained batch metrics, oldest first. */
  def snapshot(): Seq[BatchMetrics] = {
    val it = ring.iterator()
    val b = Seq.newBuilder[BatchMetrics]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def startedCount: Long = started
  def terminatedCount: Long = terminated

  /** Latest retained state-row total per query name — the number an
    * alert threshold watches (unbounded state growth = a missing TTL or
    * watermark). */
  def latestStateRows: Map[String, Long] =
    snapshot().groupBy(_.queryName)
      .map { case (n, ms) => n -> ms.maxBy(_.batchId).stateRows }
}
