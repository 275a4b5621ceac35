package graft.schema

/** The LogRequest batch envelope and its child event types (SURVEY §1.2,
  * FIXTURES.md §1), narrowed to the fields the pipeline exercises.
  *
  * One envelope carries repeated child events; envelope-level fields
  * (platform id, user info, timing) push down into children that left them
  * unset (reference: P:common/functions/PushDownBatchFields.java:46-100).
  * Timestamps are epoch millis.
  */
case class UserInfo(userId: String = "", logUserId: String = "")

case class Timing(
    clientLogTimestamp: Long = 0L,
    eventApiTimestamp: Long = 0L,
    logTimestamp: Long = 0L)

case class Browser(userAgent: String = "")

case class Device(browser: Browser = Browser())

/** trafficType: PRODUCTION | SHADOW | LOAD_TEST | INTERNAL | REPLAY | ""
  * (unset = UNKNOWN, treated as production —
  * P:common/util/DeliveryLogUtil.java:31-46). */
case class ClientInfo(trafficType: String = "")

case class View(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    viewId: String = "",
    name: String = "",
    contentId: String = "",
    device: Device = Device())

case class ResponseInsertion(
    insertionId: String = "",
    contentId: String = "",
    position: Long = -1L,
    /** Execution-insertion sparse feature ids (e.g. the non-buyer-user
      * flag probed by BuyerPredicate, P:common/functions/filter/
      * BuyerPredicate.java:40-48). */
    sparseFeatures: Map[Long, Long] = Map.empty)

/** Request-side insertion, materialized by RestructureDeliveryLog from the
  * compact insertion-matrix transport form
  * (P:common/functions/RestructureDeliveryLog.java:14-56). */
case class RequestInsertion(
    contentId: String = "",
    retrievalRank: Long = -1L,
    retrievalScore: Double = 0.0,
    /** Non-fast-path matrix headers land here keyed by their dotted path. */
    properties: Map[String, String] = Map.empty)

case class DeliveryRequest(
    requestId: String = "",
    clientRequestId: String = "",
    viewId: String = "",
    searchQuery: String = "",
    device: Device = Device(),
    clientInfo: ClientInfo = ClientInfo(),
    /** Compact transport form: insertionMatrixHeaders names the columns of
      * each insertionMatrix row; RestructureDeliveryLog expands them. */
    insertionMatrixHeaders: Seq[String] = Nil,
    insertionMatrix: Seq[Seq[String]] = Nil,
    requestInsertions: Seq[RequestInsertion] = Nil)

case class DeliveryLog(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    request: DeliveryRequest = DeliveryRequest(),
    insertions: Seq[ResponseInsertion] = Nil,
    executionServer: String = "API") // API | SDK

case class Impression(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    impressionId: String = "",
    insertionId: String = "",
    contentId: String = "",
    viewId: String = "",
    requestId: String = "")

case class CartContent(
    contentId: String = "",
    quantity: Long = 0L,
    priceMicrosPerUnit: Long = 0L)

case class Action(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    actionId: String = "",
    impressionId: String = "",
    insertionId: String = "",
    contentId: String = "",
    viewId: String = "",
    requestId: String = "",
    actionType: Int = 0, // NAVIGATE=2, PURCHASE=3, ADD_TO_CART=4, CHECKOUT=8
    cart: Seq[CartContent] = Nil)

case class UserRecord(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing())

case class LogRequest(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    users: Seq[UserRecord] = Nil,
    views: Seq[View] = Nil,
    deliveryLogs: Seq[DeliveryLog] = Nil,
    impressions: Seq[Impression] = Nil,
    actions: Seq[Action] = Nil)

object ActionType {
  val Navigate = 2
  val Purchase = 3
  val AddToCart = 4
  val Checkout = 8
}
