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

case class View(
    platformId: Long = 0L,
    userInfo: UserInfo = UserInfo(),
    timing: Timing = Timing(),
    viewId: String = "",
    name: String = "",
    contentId: String = "")

case class ResponseInsertion(
    insertionId: String = "",
    contentId: String = "",
    position: Long = -1L)

case class DeliveryRequest(
    requestId: String = "",
    clientRequestId: String = "",
    viewId: String = "",
    searchQuery: String = "")

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
