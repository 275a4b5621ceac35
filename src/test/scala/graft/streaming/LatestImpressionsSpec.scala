package graft.streaming

import graft.SparkSpec
import graft.operators.Cogroup
import graft.streaming.LatestImpressions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** AddLatestImpressions semantics (AddLatestImpressions.java:33-388):
  * actioned-content exclusion, duplicate-content dedupe (newest wins),
  * output cap, state cap — pinned at the pure `advance` level, plus
  * streaming ≡ batch ≡ the relational attachLatestExcluding operator. */
class LatestImpressionsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private val key = (0L, "lu")
  private def imp(id: String, ts: Long, c: String) = Event(0L, "lu", 0, id, c, ts)
  private def act(id: String, ts: Long, c: String) = Event(0L, "lu", 1, id, c, ts)

  private def run(events: Seq[Event], k: Int = 3): Map[String, String] =
    advance(key, events.sortBy(e => (e.tsMs, e.side, e.id)), emptyState,
      Long.MaxValue, k, Int.MaxValue, 6L * 3600000L, 10L)._1
      .map(a => a.actionId -> a.impressionIds).toMap

  test("attaches latest impressions newest-first, capped") {
    val out = run(Seq(imp("i1", 100, "c1"), imp("i2", 200, "c2"),
      imp("i3", 300, "c3"), imp("i4", 400, "c4"), act("a", 500, "c9")), k = 3)
    assert(out("a") == "i4,i3,i2")
  }

  test("duplicate content keeps only the newest impression") {
    val out = run(Seq(imp("i1", 100, "c1"), imp("i2", 200, "c1"),
      imp("i3", 300, "c2"), act("a", 500, "c9")))
    assert(out("a") == "i3,i2")
  }

  test("actioned content is excluded, including the action's own content") {
    val out = run(Seq(imp("i1", 100, "c1"), imp("i2", 200, "c2"),
      act("a1", 300, "c1"), act("a2", 500, "c9")))
    // a2: c1 was actioned by a1 at 300 <= 500 → i1 excluded
    assert(out("a2") == "i2")
    // a1 actions c1 itself → i1 excluded from its own list too
    assert(out("a1") == "i2")
  }

  test("impressions after the action or outside the session don't attach") {
    val at = 30L * 3600000L // 30h
    val out = run(Seq(
      imp("iOld", at - 7L * 3600000L, "c1"), // 7h before: outside 6h session
      imp("iNew", at + 1000L, "c2"), // after the action
      imp("iIn", at - 3600000L, "c3"), // 1h before: attaches
      act("a", at, "c9")))
    assert(out("a") == "iIn")
  }

  test("state cap drops oldest content under watermark pressure") {
    // prune with a real watermark: maxState=2 keeps the 2 newest contents
    val events = Seq(imp("i1", 100, "c1"), imp("i2", 200, "c2"),
      imp("i3", 300, "c3"))
    val (_, st) = advance(key, events, emptyState, wmMs = 1000L, k = 3,
      maxState = 2, sessionMs = 6L * 3600000L, oooMs = 10L)
    assert(st.impressions.map(_.id) == List("i2", "i3"))
  }

  test("randomized: FMGWS batch ≡ relational operator on 50 generated sets") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 50) {
      val nImp = 1 + rnd.nextInt(12); val nAct = 1 + rnd.nextInt(6)
      val contents = Array("c1", "c2", "c3", "c4")
      val events =
        (1 to nImp).map(i => imp(f"i$i%02d", rnd.nextInt(5000).toLong,
          contents(rnd.nextInt(contents.length)))) ++
        (1 to nAct).map(i => act(f"a$i%02d", rnd.nextInt(6000).toLong,
          contents(rnd.nextInt(contents.length))))
      val k = 1 + rnd.nextInt(3)
      val look = 1000L + rnd.nextInt(4000)

      val fmgws = advance(key, events.sortBy(e => (e.tsMs, e.side, e.id)),
        emptyState, Long.MaxValue, k, Int.MaxValue, look, 10L)._1
        .filter(_.impressionIds.nonEmpty)
        .map(a => a.actionId -> a.impressionIds).toMap

      val df = events.toDF()
      val acts = df.where(col("side") === 1).select(col("logUserId"),
        col("id").as("action_id"), col("tsMs"), col("contentId"))
      val imps = df.where(col("side") === 0).select(col("logUserId"),
        col("id").as("imp_id"), col("tsMs").as("impTs"), col("contentId"))
      val rel = Cogroup.attachLatestExcluding(acts, imps, Seq("logUserId"),
        "tsMs", "impTs", "action_id", "imp_id", "contentId", k, look)
        .groupBy(col("action_id"))
        .agg(array_join(transform(sort_array(collect_list(
          struct(col("rank"), col("imp_id")))), x => x.getField("imp_id")), ",")
          .as("ids"))
        .as[(String, String)].collect().toMap
      assert(fmgws == rel, s"trial $trial (k=$k look=$look): $events")
    }
  }

  test("streaming ≡ batch ≡ relational operator on shared input") {
    val events = Seq(
      imp("i01", 1000, "c1"), imp("i02", 2000, "c2"), imp("i03", 3000, "c1"),
      imp("i04", 4000, "c3"), act("a01", 5000, "c2"), imp("i05", 6000, "c4"),
      imp("i06", 7000, "c5"), act("a02", 8000, "c9"), imp("i07", 9000, "c2"),
      act("a03", 10000, "c5"), act("a04", 11000, "c5"))

    val batch = attachBatch(events.toDS(), k = 3,
      sessionMs = 6L * 3600000L, oooMs = 10L)
      .collect().map(a => a.actionId -> a.impressionIds).toMap

    // relational: same exclusion semantics, serialized in rank order
    val df = events.toDF()
    val acts = df.where(col("side") === 1).select(col("logUserId"),
      col("id").as("action_id"), col("tsMs"), col("contentId"))
    val imps = df.where(col("side") === 0).select(col("logUserId"),
      col("id").as("imp_id"), col("tsMs").as("impTs"), col("contentId"))
    val rel = Cogroup.attachLatestExcluding(acts, imps, Seq("logUserId"),
      "tsMs", "impTs", "action_id", "imp_id", "contentId", 3, 6L * 3600000L)
      .groupBy(col("action_id"))
      .agg(array_join(transform(sort_array(collect_list(
        struct(col("rank"), col("imp_id")))), x => x.getField("imp_id")), ",")
        .as("ids"))
      .as[(String, String)].collect().toMap
    // actions with an empty attach list don't appear in the relational
    // (inner-join) output; align by filtering empties from the FMGWS side
    assert(batch.filter(_._2.nonEmpty) == rel)

    // streaming: feed everything, advance the watermark far past the data
    val mem = MemoryStream[Event]
    val out = attachStream(mem.toDS(), "1 second", 3, 30,
      6L * 3600000L, 10L)
    val q = out.writeStream.format("memory").queryName("latest_imp_stream")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(act("aFlush", 10L * 3600000L, "cF")) // push watermark
    q.processAllAvailable()
    val streamed = spark.table("latest_imp_stream")
      .as[ActionWithLatest].collect()
      .filter(_.actionId != "aFlush")
      .map(a => a.actionId -> a.impressionIds).toMap
    q.stop()
    assert(streamed == batch)
  }
}
