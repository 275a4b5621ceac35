package graft.sources

import graft.SparkSpec

/** Deterministic stub standing in for the Content API HTTP client —
  * top-level so the task closure doesn't capture the suite. */
class StubClient extends ContentLookup.ContentClient {
  override def lookup(ids: Seq[String]): Map[String, Map[Int, String]] =
    ids.map(id => id -> Map(1 -> s"store-of-$id")).toMap
}

/** Latency-injecting stub that records peak concurrency and per-id fetch
  * counts (JVM-static so local-mode executor threads share them). */
object SlowStubClient {
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val peak = new java.util.concurrent.atomic.AtomicInteger(0)
  val fetches = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def reset(): Unit = { inFlight.set(0); peak.set(0); fetches.clear() }
}
class SlowStubClient extends ContentLookup.ContentClient {
  override def lookup(ids: Seq[String]): Map[String, Map[Int, String]] = {
    val cur = SlowStubClient.inFlight.incrementAndGet()
    SlowStubClient.peak.updateAndGet(p => math.max(p, cur))
    ids.foreach(id => SlowStubClient.fetches.merge(id, 1, (a, b) => a + b))
    Thread.sleep(30)
    SlowStubClient.inFlight.decrementAndGet()
    ids.map(id => id -> Map(1 -> s"store-of-$id")).toMap
  }
}

class ContentLookupSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("enrichWithClient attaches parent ids with batching + cache") {
    val items = (1 to 500).map(i => s"item-${i % 20}").toDS()
    val out = ContentLookup.enrichWithClient[String](
      items, identity, new StubClient, batchSize = 32, cacheSize = 8)
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(e => e.otherContentIds(1) == s"store-of-${e.value}"))
  }

  test("async variant: same answers, input order preserved") {
    SlowStubClient.reset()
    val items = (1 to 300).map(i => s"item-$i").toDS().coalesce(1)
    val out = ContentLookup.enrichWithClientAsync[String](
      items, identity, new SlowStubClient, batchSize = 25, maxInFlight = 4)
    val rows = out.collect()
    assert(rows.map(_.value).toSeq == (1 to 300).map(i => s"item-$i"))
    assert(rows.forall(e => e.otherContentIds(1) == s"store-of-${e.value}"))
  }

  test("async variant overlaps batch fetches (peak in-flight > 1)") {
    SlowStubClient.reset()
    // 12 batches of distinct ids on ONE partition: a serial client would
    // never have two lookups outstanding; the async window should
    val items = (1 to 120).map(i => s"u$i").toDS().coalesce(1)
    ContentLookup.enrichWithClientAsync[String](
      items, identity, new SlowStubClient, batchSize = 10, maxInFlight = 4)
      .collect()
    assert(SlowStubClient.peak.get() >= 2,
      s"no overlap observed: peak=${SlowStubClient.peak.get()}")
  }

  test("async variant survives eviction pressure (cache smaller than a batch)") {
    SlowStubClient.reset()
    // 40 distinct ids per batch against a 4-entry cache: every batch's
    // puts evict earlier entries (including same-batch ones and prior
    // hits) before emission resolves — futures must be captured directly,
    // not read back through the cache
    val items = (1 to 200).map(i => s"e${i % 50}").toDS().coalesce(1)
    val rows = ContentLookup.enrichWithClientAsync[String](
      items, identity, new SlowStubClient, batchSize = 40, cacheSize = 4,
      maxInFlight = 3).collect()
    assert(rows.length == 200)
    assert(rows.forall(e => e.otherContentIds(1) == s"store-of-${e.value}"))
  }

  test("async variant dedups in-flight fetches of a recurring id") {
    SlowStubClient.reset()
    // the same id appears in every batch; batches 2..N are submitted while
    // batch 1's fetch is still sleeping — the future-valued cache must
    // hand them the in-flight future instead of re-fetching
    val items = (1 to 100).map(i => if (i % 2 == 0) "hot" else s"cold-$i")
      .toDS().coalesce(1)
    val rows = ContentLookup.enrichWithClientAsync[String](
      items, identity, new SlowStubClient, batchSize = 10, maxInFlight = 4)
      .collect()
    assert(rows.length == 100)
    assert(SlowStubClient.fetches.get("hot") == 1,
      s"hot id fetched ${SlowStubClient.fetches.get("hot")} times")
  }

  test("empty contentId maps to no enrichment") {
    val out = ContentLookup.enrichWithClient[String](
      Seq("", "item-1").toDS(), identity, new StubClient)
    val m = out.collect().map(e => e.value -> e.otherContentIds).toMap
    assert(m("") == Map.empty)
    assert(m("item-1").nonEmpty)
  }
}
