package graft.sources

import graft.SparkSpec

/** Deterministic stub standing in for the Content API HTTP client —
  * top-level so the task closure doesn't capture the suite. */
class StubClient extends ContentLookup.ContentClient {
  override def lookup(ids: Seq[String]): Map[String, Map[Int, String]] =
    ids.map(id => id -> Map(1 -> s"store-of-$id")).toMap
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

  test("empty contentId maps to no enrichment") {
    val out = ContentLookup.enrichWithClient[String](
      Seq("", "item-1").toDS(), identity, new StubClient)
    val m = out.collect().map(e => e.value -> e.otherContentIds).toMap
    assert(m("") == Map.empty)
    assert(m("item-1").nonEmpty)
  }
}
