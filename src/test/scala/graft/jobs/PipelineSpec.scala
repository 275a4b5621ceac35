package graft.jobs

import graft.SparkSpec
import graft.sources.{FakeLogGenerator, LogRequestSplit, Validation}
import org.apache.spark.sql.functions._

/** End-to-end job tests over the deterministic generator — the reference's
  * MiniCluster-tests-in-batch-mode approach (SURVEY §5). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private lazy val opts = FakeLogGenerator.Options()
  private lazy val envelopes = FakeLogGenerator.generate(opts).toDS().toDF()

  test("generator is deterministic") {
    val a = FakeLogGenerator.generate(opts)
    val b = FakeLogGenerator.generate(opts)
    assert(a == b)
    assert(a.size == opts.users * opts.viewsPerUser)
  }

  test("splitter explodes children with push-down and lowercases logUserId") {
    val views = LogRequestSplit.views(envelopes).collect()
    assert(views.length == opts.users * opts.viewsPerUser)
    assert(views.forall(_.platformId == opts.platformId))
    assert(views.forall(v => v.userInfo.logUserId.startsWith("lu-")))
    val imps = LogRequestSplit.impressions(envelopes).collect()
    assert(imps.length == opts.users * opts.viewsPerUser *
      opts.requestsPerView * opts.insertionsPerRequest)
  }

  test("validation routes bad records to the error side channel") {
    import graft.schema._
    val acts = Seq(
      Action(1L, UserInfo("u", "lu"), Timing(1, 2, 3), "a1", "imp1"),
      Action(1L, UserInfo("u", ""), Timing(1, 2, 3), "a2", "imp1"), // no logUserId
      Action(1L, UserInfo("u", "lu"), Timing(1, 2, 3), "a3") // no join ref
    ).toDS().toDF()
    val ok = Validation.valid(acts, Validation.actionRules).collect()
    val bad = Validation.errors(acts, Validation.actionRules)
      .select("actionId", "error").as[(String, String)].collect().toSet
    assert(ok.map(_.getAs[String]("actionId")).toSeq == Seq("a1"))
    assert(bad.contains(("a2", "missing_log_user_id")))
    assert(bad.contains(("a3", "missing_join_ref")))
  }

  test("clearUserId strips PII but keeps logUserId") {
    val cleaned = Validation.clearUserId(LogRequestSplit.views(envelopes).toDF())
      .select("userInfo.userId", "userInfo.logUserId").distinct().collect()
    assert(cleaned.forall(_.getString(0) == ""))
    assert(cleaned.forall(_.getString(1).nonEmpty))
  }

  test("RawOutputJob dedupes per pk and emits LogUserUser") {
    val doubled = envelopes.unionByName(envelopes) // duplicate every record
    val out = RawOutputJob.run(doubled)
    assert(out.views.count() == opts.users * opts.viewsPerUser)
    assert(out.impressions.count() ==
      opts.users * opts.viewsPerUser * opts.requestsPerView * opts.insertionsPerRequest)
    val luu = out.logUserUser.collect()
    assert(luu.length == opts.users)
    assert(luu.forall(r => r.getAs[String]("userId").nonEmpty))
  }

  test("FlatOutputJob joins every impression (exact or inferred)") {
    val out = FlatOutputJob.run(envelopes)
    val totalImps = opts.users * opts.viewsPerUser *
      opts.requestsPerView * opts.insertionsPerRequest
    val joined = out.joinedImpressions
    val byType = joined.groupBy("matchType").count()
      .as[(String, Long)].collect().toMap
    // impressions with an FK match exactly; FK-less ones infer via time
    assert(byType.getOrElse("exact", 0L) > 0)
    assert(byType.getOrElse("inferred", 0L) > 0)
    assert(byType.values.sum + out.droppedImpressions.count() == totalImps)
    // every joined action keeps full action details (J6 merge)
    val acts = out.joinedActions
    assert(acts.where(col("actionType").isNull).count() == 0)
    assert(acts.count() + out.droppedActions.count() ==
      totalImps * opts.actionsPerImpression)
  }

  test("pre-join filters drop bots and non-joinable traffic to side channels") {
    val filteredOpts = FakeLogGenerator.Options(replayTrafficEvery = 3,
      botViewEvery = 2, matrixEvery = 4)
    val env = FakeLogGenerator.generate(filteredOpts).toDS().toDF()
    val out = FlatOutputJob.run(env)
    val dlogReasons = out.droppedDeliveryLogs.select("reason")
      .as[String].collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(dlogReasons.getOrElse("should_not_join", 0) > 0)
    assert(out.droppedViews.count() > 0)
    // dropped delivery logs' impressions can no longer exact-join
    assert(out.droppedImpressions.count() > 0)
  }

  test("cart actions split per item; the view arm rides the chain") {
    import graft.schema._
    val base = FakeLogGenerator.generate(FakeLogGenerator.Options(users = 1))
    // add a 2-item cart purchase referencing an existing impression
    val firstImp = base.head.impressions.head
    val cartAct = Action(1L, firstImp.userInfo, Timing(eventApiTimestamp =
      firstImp.timing.eventApiTimestamp + 10L),
      "a-cart", firstImp.impressionId, firstImp.insertionId, firstImp.contentId,
      firstImp.viewId, firstImp.requestId, ActionType.Purchase,
      Seq(CartContent("c-x", 1L, 100L), CartContent("c-y", 2L, 200L)))
    val env = (base.head.copy(actions = base.head.actions :+ cartAct) +: base.tail)
      .toDS().toDF()
    val out = FlatOutputJob.run(env)
    val items = out.joinedActions.where(col("actionId") === "a-cart")
      .select("itemContentId").as[String].collect().sorted
    assert(items.toSeq == Seq("c-x", "c-y"))
    // chainViewId present on joined impressions (view × insertion arm)
    val withView = out.joinedImpressions.where(col("chainViewId") =!= "")
    assert(withView.count() > 0)
  }

  test("other-content dims attribute child-content actions to parent impressions") {
    import graft.schema._
    val t0 = 1700000000000L
    val ui = UserInfo("u-1", "lu-1")
    val view = View(1L, ui, Timing(eventApiTimestamp = t0), "v-1", "view", "",
      Device(Browser("Mozilla/5.0")))
    val ins = ResponseInsertion("i-1", "store-1", 0L)
    val dlog = DeliveryLog(1L, ui, Timing(eventApiTimestamp = t0 + 1000L),
      DeliveryRequest("r-1", "cr-1", "v-1", "q",
        Device(Browser("Mozilla/5.0")), ClientInfo("PRODUCTION"), Nil, Nil),
      Seq(ins))
    val imp = Impression(1L, ui, Timing(eventApiTimestamp = t0 + 2000L),
      "imp-1", "i-1", "store-1", "v-1", "r-1")
    // action on the CHILD item, with NO foreign keys at all
    val act = Action(1L, ui, Timing(eventApiTimestamp = t0 + 3000L),
      "a-item", "", "", "item-1", "", "")
    val env = Seq(LogRequest(1L, ui, Timing(eventApiTimestamp = t0),
      Nil, Seq(view), Seq(dlog), Seq(imp), Seq(act))).toDS().toDF()

    // without content dims: no shared scope or content → dropped
    val bare = FlatOutputJob.run(env)
    assert(bare.droppedActions.where(col("rightId").startsWith("a-item")).count() == 1)

    // with the item → store rollup: joins via the parent-content scope
    val dims = Seq(("item-1", Seq("store-1"))).toDF("contentId", "otherIds")
    val out = FlatOutputJob.run(env, contentOtherIds = Some(dims))
    val joined = out.joinedActions.where(col("actionId") === "a-item")
      .select("impressionId", "matchType").as[(String, String)].collect()
    assert(joined.toSeq == Seq(("imp-1", "inferred")))
  }

  test("golden chain invariant: 700 raw impressions -> deterministic flat count") {
    // The reference's fake-data pipeline emits ~681 flat impressions from
    // 700 raw ones (P:pipeline/README.md:92-94) — losses come from
    // non-joinable traffic and inference misses. Same invariant here with
    // this generator's knobs; the exact count is pinned for regression.
    val goldenOpts = FakeLogGenerator.Options(users = 7, viewsPerUser = 2,
      requestsPerView = 2, insertionsPerRequest = 25,
      missingFkEvery = 5, replayTrafficEvery = 7, botViewEvery = 5)
    val env = FakeLogGenerator.generate(goldenOpts).toDS().toDF()
    assert(LogRequestSplit.impressions(env).count() == 700L)
    val out = FlatOutputJob.run(env)
    val joined = out.joinedImpressions.count()
    val dropped = out.droppedImpressions.count()
    assert(joined + dropped == 700L)
    assert(joined < 700L && joined > 500L)
    val expected = 700L - dropped
    assert(joined == expected)
    // pin the deterministic value (recompute if generator knobs change)
    assert(joined == GoldenFlatImpressions, s"joined=$joined")
  }

  private val GoldenFlatImpressions = 620L

  test("CounterJob emits HSET command frames with packed feature ids") {
    val flat = FlatOutputJob.run(envelopes)
    val events = flat.joinedActions.select(col("platformId"),
      col("userInfo.logUserId").as("logUserId"),
      lit("u").as("userId"), col("contentId"), col("actionType"),
      col("timing.eventApiTimestamp").as("tsMs"), lit(null).cast("long").as("quantity"))
    val cmds = CounterJob.run(events)
    val rows = cmds.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("cmd") == "HSET"))
    // key families present: global (1) and content (2) keys
    val keys = rows.map(_.getAs[String]("key"))
    assert(keys.exists(_.startsWith("1\u001f")))
    assert(keys.exists(_.startsWith("2\u001f")))
    // counter-family fields decode: countType<<24 | metric<<8 | window
    // (last-seen features use a contentId-scoped field instead)
    val fields = rows.map(_.getAs[String]("field"))
      .filter(_.forall(_.isDigit)).map(_.toLong)
    assert(fields.nonEmpty)
    assert(fields.forall(f => (f >> 24) >= 1 && (f >> 24) <= 6))
  }

  test("ContentMetricsJob rolls up metric columns per content and hour") {
    val hourly = ContentMetricsJob.hourly(envelopes)
    val total = hourly.agg(
      sum("view_count"), sum("impression_count"),
      sum("purchase_count"), sum("gmv_usd_micros"))
      .as[(Long, Long, Long, Long)].head()
    assert(total._1 == opts.users * opts.viewsPerUser)
    assert(total._2 == opts.users * opts.viewsPerUser *
      opts.requestsPerView * opts.insertionsPerRequest)
    assert(total._3 > 0) // cart purchases exist
    assert(total._4 == total._3 * 2L * 1990000L) // qty 2 × unit price
    assert(hourly.columns.contains("dt") && hourly.columns.contains("hour"))
  }
}
