package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._

/** LogRequest envelope splitter with field push-down (SURVEY S2).
  *
  * One envelope stream fans out into typed child streams; envelope-level
  * platformId/userInfo/timing push down into children that left them unset
  * (reference: P:common/functions/filter/LogRequestFilter.java:35-155 +
  * P:common/functions/pushdown/BasePushDownAndFlatMap.java subclasses).
  * The reference also lower-cases logUserId on split.
  *
  * Spark shape: `explode` per repeated field over one shared parsed
  * Dataset; Catalyst prunes the other child arrays out of each branch's
  * scan, so splitting N types costs N column-pruned passes, not N full
  * deserializations.
  */
object LogRequestSplit {

  private def pushDownUser(child: String): Column =
    struct(
      lower(coalesce(
        when(col(s"$child.userInfo.logUserId") =!= "", col(s"$child.userInfo.logUserId")),
        col("userInfo.logUserId"))).as("logUserId"),
      coalesce(
        when(col(s"$child.userInfo.userId") =!= "", col(s"$child.userInfo.userId")),
        col("userInfo.userId")).as("userId"))

  private def pushDownTiming(child: String): Column =
    struct(
      coalesce(
        when(col(s"$child.timing.clientLogTimestamp") =!= 0L,
          col(s"$child.timing.clientLogTimestamp")),
        col("timing.clientLogTimestamp")).as("clientLogTimestamp"),
      coalesce(
        when(col(s"$child.timing.eventApiTimestamp") =!= 0L,
          col(s"$child.timing.eventApiTimestamp")),
        col("timing.eventApiTimestamp")).as("eventApiTimestamp"),
      coalesce(
        when(col(s"$child.timing.logTimestamp") =!= 0L,
          col(s"$child.timing.logTimestamp")),
        col("timing.logTimestamp")).as("logTimestamp"))

  private def pushDownPlatform(child: String): Column =
    coalesce(
      when(col(s"$child.platformId") =!= 0L, col(s"$child.platformId")),
      col("platformId")).as("platformId")

  /** Explode one child array with envelope push-down applied. The child
    * type's remaining fields pass through untouched. */
  def split(envelopes: DataFrame, arrayField: String): DataFrame = {
    val childCols = envelopes.select(explode(col(arrayField)).as("__c"))
      .select("__c.*").columns
    val rest = childCols.filterNot(Set("platformId", "userInfo", "timing"))
    envelopes
      .select(col("platformId"), col("userInfo"), col("timing"),
        explode(col(arrayField)).as("__c"))
      .select(
        (pushDownPlatform("__c") +:
          pushDownUser("__c").as("userInfo") +:
          pushDownTiming("__c").as("timing") +:
          rest.toSeq.map(c => col(s"__c.$c").as(c))): _*)
  }

  def views(env: DataFrame)(implicit s: SparkSession): Dataset[View] = {
    import s.implicits._; split(env, "views").as[View]
  }
  def deliveryLogs(env: DataFrame)(implicit s: SparkSession): Dataset[DeliveryLog] = {
    import s.implicits._; split(env, "deliveryLogs").as[DeliveryLog]
  }
  def impressions(env: DataFrame)(implicit s: SparkSession): Dataset[Impression] = {
    import s.implicits._; split(env, "impressions").as[Impression]
  }
  def actions(env: DataFrame)(implicit s: SparkSession): Dataset[Action] = {
    import s.implicits._; split(env, "actions").as[Action]
  }
  def users(env: DataFrame)(implicit s: SparkSession): Dataset[UserRecord] = {
    import s.implicits._; split(env, "users").as[UserRecord]
  }

  /** Stamp the transport (Kafka/log) timestamp into timing.logTimestamp —
    * reference SetLogTimestamp (P:common/functions/SetLogTimestamp.java). */
  def setLogTimestamp(df: DataFrame, tsMs: Column): DataFrame =
    df.withColumn("timing",
      struct(col("timing.clientLogTimestamp").as("clientLogTimestamp"),
        col("timing.eventApiTimestamp").as("eventApiTimestamp"),
        tsMs.as("logTimestamp")))
}
