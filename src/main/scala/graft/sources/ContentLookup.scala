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
}
