package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Content-API "dimension service" enrichment (SURVEY S4; reference
  * CachingContentDataStreamLookup — Flink Async I/O + Caffeine cache,
  * P:common/functions/content/datastream/CachingContentDataStreamLookup
  * .java:24-120): attach `otherContentIds` (e.g. item → store/brand
  * rollup ids) to events by contentId.
  *
  * Spark has no async-I/O operator; the two production shapes are:
  *  1. `enrichWithClient` — mapPartitions with a per-partition client and
  *     LRU cache, batching ids per partition (bounded in-flight work,
  *     cache hit rate ∝ contentId locality → repartition by contentId
  *     upstream when hit rate matters);
  *  2. periodic snapshot of the content DB → plain broadcast join — the
  *     preferred 100 TB path when the dimension fits in memory.
  */
object ContentLookup {

  trait ContentClient extends Serializable {
    /** Batched lookup: contentId → parent ids (type tag → id). */
    def lookup(contentIds: Seq[String]): Map[String, Map[Int, String]]
  }

  case class Enriched[T](value: T, otherContentIds: Map[Int, String])

  /** Per-partition batched+cached lookup. */
  def enrichWithClient[T](ds: Dataset[T], contentIdOf: T => String,
      client: ContentClient, batchSize: Int = 100, cacheSize: Int = 10000)(
      implicit spark: SparkSession,
      enc: org.apache.spark.sql.Encoder[Enriched[T]]): Dataset[Enriched[T]] = {
    ds.mapPartitions { it =>
      val cache = new java.util.LinkedHashMap[String, Map[Int, String]](
        cacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Map[Int, String]]): Boolean =
          size() > cacheSize
      }
      it.grouped(batchSize).flatMap { batch =>
        // resolve hits BEFORE inserting this batch's fetches: with a cache
        // smaller than a batch's distinct ids, puts would evict entries
        // (including prior hits) before they are read back
        val hits: Map[String, Map[Int, String]] = batch.map(contentIdOf)
          .distinct.filter(_.nonEmpty)
          .flatMap(id => Option(cache.get(id)).map(id -> _)).toMap
        val misses = batch.map(contentIdOf).distinct
          .filterNot(id => id.isEmpty || hits.contains(id))
        val fetched: Map[String, Map[Int, String]] =
          if (misses.nonEmpty) client.lookup(misses) else Map.empty
        fetched.foreach { case (k, v) => cache.put(k, v) }
        val answers = hits ++ fetched
        batch.map(v => Enriched(v, answers.getOrElse(contentIdOf(v), Map.empty)))
      }
    }
  }

  /** Async-pipelined lookup — the Spark shape of the reference's Flink
    * Async I/O + caching operator: up to `maxInFlight` batch fetches are
    * outstanding at once, so request latency overlaps both other requests
    * and downstream row processing instead of serializing per batch, while
    * emission order stays the input order (Flink's "ordered wait" mode).
    *
    * The cache maps contentId → Future of its parent ids: a completed
    * entry is an ordinary LRU hit; an in-flight entry dedups concurrent
    * fetches of an id that recurs before its first fetch returns (the
    * async-cache behavior the reference gets from Caffeine's future
    * values). Only the partition thread touches the cache — worker threads
    * just run `client.lookup` — so no synchronization is needed.
    *
    * Throughput ≈ min(client QPS · maxInFlight, downstream rate) per
    * partition; total in-flight requests across a 1000-executor job is
    * partitions · maxInFlight — size against the dimension service's
    * rate limit, exactly as the reference tunes its async capacity. */
  def enrichWithClientAsync[T](ds: Dataset[T], contentIdOf: T => String,
      client: ContentClient, batchSize: Int = 100, cacheSize: Int = 10000,
      maxInFlight: Int = 4)(
      implicit spark: SparkSession,
      enc: org.apache.spark.sql.Encoder[Enriched[T]]): Dataset[Enriched[T]] = {
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(maxInFlight)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      // kill the pool even when downstream stops early (limit, take)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      val cache = new java.util.LinkedHashMap[String, Future[Map[Int, String]]](
        cacheSize, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Future[Map[Int, String]]]): Boolean =
          size() > cacheSize
      }
      type Pending = (Seq[T], Map[String, Future[Map[Int, String]]])
      // submit-time resolution: capture each id's future DIRECTLY (hits
      // before any put, misses from the fetch future itself) — reading
      // back through cache.get after the puts would NPE whenever LRU
      // eviction (cache smaller than a batch's distinct ids, or a hit
      // sitting at the eldest slot) dropped an entry we still owe
      def submit(batch: Seq[T]): Pending = {
        val ids = batch.map(contentIdOf).distinct.filter(_.nonEmpty)
        val hits = ids.flatMap(id => Option(cache.get(id)).map(id -> _)).toMap
        val misses = ids.filterNot(hits.contains)
        val fetched: Map[String, Future[Map[Int, String]]] =
          if (misses.isEmpty) Map.empty
          else {
            val f = Future(client.lookup(misses))
            misses.map { id =>
              val fid = f.map(_.getOrElse(id, Map.empty))
              cache.put(id, fid)
              id -> fid
            }.toMap
          }
        (batch, hits ++ fetched)
      }
      val batches = it.grouped(batchSize)
      val window = scala.collection.mutable.Queue.empty[Pending]
      new Iterator[Enriched[T]] {
        private var out: Iterator[Enriched[T]] = Iterator.empty
        private def refill(): Unit = {
          while (window.size < maxInFlight && batches.hasNext)
            window.enqueue(submit(batches.next()))
          while (!out.hasNext && window.nonEmpty) {
            val (batch, futs) = window.dequeue()
            val resolved = futs.map { case (id, f) =>
              id -> Await.result(f, Duration.Inf) }
            out = batch.iterator.map(v =>
              Enriched(v, resolved.getOrElse(contentIdOf(v), Map.empty)))
            while (window.size < maxInFlight && batches.hasNext)
              window.enqueue(submit(batches.next()))
          }
          if (!out.hasNext && window.isEmpty && !batches.hasNext) pool.shutdown()
        }
        override def hasNext: Boolean = { if (!out.hasNext) refill(); out.hasNext }
        override def next(): Enriched[T] = {
          if (!hasNext) throw new NoSuchElementException; out.next()
        }
      }
    }
  }
}
