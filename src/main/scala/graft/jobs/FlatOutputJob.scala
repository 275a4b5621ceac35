package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.ScopedEvent
import graft.sources.{Filters, LogRequestSplit, Validation}
import graft.streaming.InferredJoin

/** Flat Output ("join") Job, batch form (reference
  * P:job/join/FlatOutputJob.java, SURVEY §3.1). Mirrors the reference's
  * wiring order (FlatOutputJob.java:411-608):
  *
  *   validate → RestructureDeliveryLog → shouldJoin traffic gate → bot
  *   filters → view ×(right-outer) insertion → insertion × impression →
  *   impression × action (cart-split) → MergeDetails → clearUserId,
  *
  * where each join stage is the scoped inferred join (exact FK, then the
  * ancestor-scope cascade with the ContentId filter) and each stage's LHS is
  * the previous stage's flat output.
  *
  * Scale notes: only TinyEvent-width columns enter the stateful joins; the
  * detail re-attachment is an equi join on the event pk, which Spark plans
  * as a shuffled hash/sort-merge join keyed on the id — per-key state never
  * holds payloads (the reference's core state-size optimization,
  * P:README.md:118-119).
  */
object FlatOutputJob {

  case class Outputs(
      joinedImpressions: DataFrame, // flat chain at impression level (+details)
      joinedActions: DataFrame, // flat chain at action level (+details)
      droppedImpressions: DataFrame,
      droppedActions: DataFrame,
      validationErrors: DataFrame,
      droppedDeliveryLogs: DataFrame, // shouldJoin gate + bot filter channel
      droppedViews: DataFrame) // bot filter channel

  private def ts(c: String = "timing.eventApiTimestamp") = col(c)

  /** Cart-item pk separator (ImpressionActionProcessFunction.java:14). */
  val CartSep = "\u0001"

  /** @param contentOtherIds optional content-dimension snapshot
    *   (contentId, otherIds: array&lt;string&gt;) — item → store/brand
    *   rollup ids from the Content API (S4). When present, the J4 stage
    *   adds them to both sides' join scopes and content-filter sets so
    *   actions on child content attribute to parent-content impressions
    *   (ImpressionActionProcessFunction.java:37-78,
    *   TinyFlatUtil.getAllContentIds). Broadcast — dimension-sized. */
  def run(envelopes: DataFrame, viewInsWindowMs: Long = 30 * 60 * 1000L,
      insImpWindowMs: Long = 30 * 60 * 1000L,
      impActWindowMs: Long = 24 * 3600 * 1000L, outOfOrderMs: Long = 1000L,
      nonBuyerUserSparseHashes: Seq[Long] = Nil,
      contentOtherIds: Option[DataFrame] = None)(
      implicit spark: SparkSession): Outputs = {
    import spark.implicits._

    val contentDims = contentOtherIds.map(d => broadcast(
      d.select(col("contentId").as("__c"), col("otherIds").as("__other"))))
    // attach the other-content rollup ids for `contentCol` as `__other`
    def attachOther(df: DataFrame, contentCol: String): DataFrame =
      contentDims match {
        case None => df.withColumn("__other", array().cast("array<string>"))
        case Some(dd) => df.join(dd, col(contentCol) === col("__c"), "left")
          .withColumn("__other",
            coalesce(col("__other"), array().cast("array<string>")))
          .drop("__c")
      }

    val viewsAll = LogRequestSplit.views(envelopes).toDF()
    val dlogsAll = LogRequestSplit.deliveryLogs(envelopes).toDF()
    val impsAll = LogRequestSplit.impressions(envelopes).toDF()
    val actsAll = LogRequestSplit.actions(envelopes).toDF()
    val usersAll = LogRequestSplit.users(envelopes).toDF()

    val viewsValid = Validation.valid(viewsAll, Validation.viewRules)
    val dlogsValid = Validation.valid(dlogsAll, Validation.deliveryLogRules)
    val imps = Validation.valid(impsAll, Validation.impressionRules)
    val acts = Validation.valid(actsAll, Validation.actionRules)
    val errors = Validation.errors(viewsAll, Validation.viewRules)
      .select(lit("view").as("record_type"), col("error"))
      .unionByName(Validation.errors(dlogsAll, Validation.deliveryLogRules)
        .select(lit("delivery_log").as("record_type"), col("error")))
      .unionByName(Validation.errors(impsAll, Validation.impressionRules)
        .select(lit("impression").as("record_type"), col("error")))
      .unionByName(Validation.errors(actsAll, Validation.actionRules)
        .select(lit("action").as("record_type"), col("error")))
      .unionByName(Validation.errors(usersAll, Validation.userRules)
        .select(lit("user").as("record_type"), col("error")))

    // P6 + P4-gate + P5: restructure, drop non-joinable traffic, drop bots —
    // all BEFORE the stateful joins (FlatOutputJob.java:435-451)
    val restructured = Filters.restructureDeliveryLog(dlogsValid)
    val joinable = Filters.shouldJoin(col("request.clientInfo.trafficType"))
    val notBotDlog = Filters.isNotBot(col("request.device.browser.userAgent"))
    val dlogs = restructured.where(joinable && notBotDlog)
    val droppedDlogs = restructured.where(!joinable || !notBotDlog)
      .select(col("request.requestId").as("id"),
        when(!joinable, "should_not_join").otherwise("is_bot").as("reason"))
    val notBotView = Filters.isNotBot(col("device.browser.userAgent"))
    val views = viewsValid.where(notBotView)
    val droppedViews = viewsValid.where(!notBotView)
      .select(col("viewId").as("id"), lit("is_bot").as("reason"))

    val pid0 = col("platformId")
    def luid = col("userInfo.logUserId").as("logUserId")
    val noContent = array().cast("array<string>").as("contentIds")

    // J2: view × insertion, right-outer, FK = request.viewId, logUserId
    // backup scope (ViewResponseInsertionProcessFunction.java:10-48)
    val tinyInsertions = dlogs.select(pid0,
        col("userInfo.logUserId").as("logUserId"), ts().as("tsMs"),
        col("request.requestId").as("requestId"),
        col("request.viewId").as("fkViewId"),
        explode(col("insertions")).as("ins"))
      .select(col("platformId"), col("logUserId"), col("tsMs"),
        col("requestId"), col("fkViewId"),
        col("ins.insertionId").as("insertionId"),
        col("ins.contentId").as("contentId"))
    val s1L = views.select(pid0, luid, lit(0).as("side"),
      col("viewId").as("id"), lit("").as("parentId"), ts().as("tsMs"),
      array(col("userInfo.logUserId")).as("scopes"), noContent)
    val s1R = tinyInsertions.select(pid0, col("logUserId"), lit(1).as("side"),
      col("insertionId").as("id"), col("fkViewId").as("parentId"),
      col("tsMs"), array(col("logUserId")).as("scopes"), noContent)
    val p1 = InferredJoin.joinScopedBatch(
      s1L.unionByName(s1R).as[ScopedEvent], viewInsWindowMs, outOfOrderMs,
      rightOuter = true)
    // flat1/flat2 feed multiple downstream branches — persist so each
    // scoped-join stage executes once (checkpoint-between-stages at scale)
    val flat1 = p1.toDF()
      .select(col("rightId").as("insertionId"), col("leftId").as("viewId"))
      .join(tinyInsertions.drop("fkViewId"), Seq("insertionId"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // J3: insertion × impression — FK = impression.insertionId; scope
    // cascade requestId → viewId → contentId
    // (InsertionImpressionProcessFunction.java:23-35)
    val s2L = flat1.select(pid0, col("logUserId"), lit(0).as("side"),
      col("insertionId").as("id"), lit("").as("parentId"), col("tsMs"),
      array(col("requestId"), col("viewId"), col("contentId")).as("scopes"),
      filter(array(col("contentId")), c => c =!= "").as("contentIds"))
    val s2R = imps.select(pid0, luid, lit(1).as("side"),
      col("impressionId").as("id"), col("insertionId").as("parentId"),
      ts().as("tsMs"),
      array(col("requestId"), col("viewId"), col("contentId")).as("scopes"),
      filter(array(col("contentId")), c => c =!= "").as("contentIds"))
    val p2 = InferredJoin.joinScopedBatch(
      s2L.unionByName(s2R).as[ScopedEvent], insImpWindowMs, outOfOrderMs,
      rightOuter = false)
    val flat2 = p2.toDF().where(col("matchType") =!= "dropped")
      .select(col("leftId").as("insertionId"),
        col("rightId").as("impressionId"),
        col("rightTs").as("tsMs"), col("matchType"))
      .join(flat1.drop("tsMs"), Seq("insertionId"))
      // mergeImpression: the impression's contentId wins when set
      .join(imps.select(col("impressionId"),
        col("contentId").as("impContentId")), Seq("impressionId"))
      .withColumn("contentId",
        when(col("impContentId") =!= "", col("impContentId"))
          .otherwise(col("contentId")))
      .drop("impContentId")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // J4: impression × action with the cart-item pk split — one RHS per
    // cart item, pk = actionId ⊕ 0x01 ⊕ contentId; empty carts fall back to
    // the action's own contentId (ImpressionActionProcessFunction.java:18-78)
    val actItems = acts
      .withColumn("item", explode(when(size(col("cart")) > 0,
          transform(col("cart"), c => c.getField("contentId")))
        .otherwise(array(col("contentId")))))
    // other-content rollup ids ride both the scope list and the content-
    // filter set (cross-content-type attribution: action on an item joins
    // the impression of its parent store/brand)
    def plusOther(base: Column): Column =
      concat(base, filter(col("__other"), c => c =!= ""))
    val s3L = attachOther(flat2, "contentId")
      .select(pid0, col("logUserId"), lit(0).as("side"),
        col("impressionId").as("id"), lit("").as("parentId"), col("tsMs"),
        plusOther(array(col("insertionId"), col("requestId"), col("viewId"),
          col("contentId"))).as("scopes"),
        filter(plusOther(array(col("contentId"))), c => c =!= "").as("contentIds"))
    val s3R = attachOther(actItems, "item")
      .select(pid0, luid, lit(1).as("side"),
        concat(col("actionId"), lit(CartSep), col("item")).as("id"),
        col("impressionId").as("parentId"), ts().as("tsMs"),
        plusOther(array(col("insertionId"), col("requestId"), col("viewId"),
          col("item"))).as("scopes"),
        filter(plusOther(array(col("item"))), c => c =!= "").as("contentIds"))
    val p3 = InferredJoin.joinScopedBatch(
      s3L.unionByName(s3R).as[ScopedEvent], impActWindowMs, outOfOrderMs,
      rightOuter = false)

    // J6 MergeDetails: re-attach full payloads by pk; chain ids ride along
    val joinedImpressions = flat2
      .select(col("impressionId"), col("insertionId"), col("requestId"),
        col("viewId").as("chainViewId"), col("matchType"))
      .join(imps.drop("insertionId", "requestId"), Seq("impressionId"), "left")
    val p3Rows = p3.toDF()
      .select(substring_index(col("rightId"), CartSep, 1).as("actionId"),
        substring_index(col("rightId"), CartSep, -1).as("itemContentId"),
        col("leftId").as("impressionId"), col("matchType"))
    val joinedActions = p3Rows.where(col("matchType") =!= "dropped")
      .join(flat2.select(col("impressionId"), col("insertionId"),
        col("requestId"), col("viewId").as("chainViewId")),
        Seq("impressionId"), "left")
      .join(acts.drop("impressionId", "insertionId", "requestId"),
        Seq("actionId"), "left")

    // P4 BuyerPredicate: drop flat events whose execution insertion flags a
    // non-buyer user (no-op when no hashes configured,
    // FlatOutputJob.java:1150-1170). Features live on the response
    // insertion; probe them through the chain's insertionId.
    def buyerFiltered(df: DataFrame): DataFrame =
      if (nonBuyerUserSparseHashes.isEmpty) df
      else {
        val feats = dlogs.select(explode(col("insertions")).as("ins"))
          .select(col("ins.insertionId").as("insertionId"),
            col("ins.sparseFeatures").as("__feats"))
        df.join(feats, Seq("insertionId"), "left")
          .where(Filters.isBuyer(col("__feats"), nonBuyerUserSparseHashes))
          .drop("__feats")
      }

    Outputs(
      Validation.clearUserId(buyerFiltered(joinedImpressions)),
      Validation.clearUserId(buyerFiltered(joinedActions)),
      p2.toDF().where(col("matchType") === "dropped"),
      p3.toDF().where(col("matchType") === "dropped"),
      errors,
      droppedDlogs,
      droppedViews)
  }
}
