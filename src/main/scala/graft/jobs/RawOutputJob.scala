package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{LogRequestSplit, Validation}

/** Raw Output Job (reference P:job/raw/RawOutputJob.java, SURVEY §3.3):
  * split the LogRequest envelope into typed streams, dedupe on each type's
  * pk, and hand each stream to an archival sink, plus the LogUserUser id
  * side table. Batch form; the streaming form swaps `dropDuplicates` for
  * `dropDuplicatesWithinWatermark` (StreamOps.keepFirstRows) and the sink
  * for a dt/hour-partitioned writeStream (sinks.PartitionedParquetSink).
  */
object RawOutputJob {

  case class Outputs(
      views: DataFrame,
      deliveryLogs: DataFrame,
      impressions: DataFrame,
      actions: DataFrame,
      logUserUser: DataFrame,
      deliveryLogIds: DataFrame, // (platformId, ts, requestId, clientRequestId, viewId)
      responseInsertionIds: DataFrame) // (platformId, ts, requestId, insertionId, contentId)

  def run(envelopes: DataFrame)(implicit spark: SparkSession): Outputs = {
    val views = Dedup.keepFirst(
      LogRequestSplit.views(envelopes).toDF(),
      Seq("viewId"), Seq(col("timing.eventApiTimestamp")))
    val dlogs = Dedup.keepFirst(
      LogRequestSplit.deliveryLogs(envelopes).toDF(),
      Seq("request.requestId"), Seq(col("timing.eventApiTimestamp")))
    val imps = Dedup.keepFirst(
      LogRequestSplit.impressions(envelopes).toDF(),
      Seq("impressionId"), Seq(col("timing.eventApiTimestamp")))
    val acts = Dedup.keepFirst(
      LogRequestSplit.actions(envelopes).toDF(),
      Seq("actionId"), Seq(col("timing.eventApiTimestamp")))
    // LogUserUser side table (reference ToLogUserUser + RawKeys dedupe)
    val luu = Dedup.keepFirst(
      LogRequestSplit.users(envelopes).toDF()
        .select(col("platformId"),
          col("timing.eventApiTimestamp").as("eventApiTimestamp"),
          col("userInfo.logUserId").as("logUserId"),
          col("userInfo.userId").as("userId"))
        .where(col("logUserId") =!= "" && col("userId") =!= ""),
      Seq("logUserId", "userId"), Seq(col("eventApiTimestamp")))
    // "ids" side tables (reference ToDeliveryLogIds / To*InsertionIds):
    // narrow key-mapping tables for offline joins without the full payload
    val dlogIds = dlogs.select(col("platformId"),
      col("timing.eventApiTimestamp").as("eventApiTimestamp"),
      col("request.requestId").as("requestId"),
      col("request.clientRequestId").as("clientRequestId"),
      col("request.viewId").as("viewId"))
    val respInsIds = dlogs.select(col("platformId"),
      col("timing.eventApiTimestamp").as("eventApiTimestamp"),
      col("request.requestId").as("requestId"),
      explode(col("insertions")).as("ins"))
      .select(col("platformId"), col("eventApiTimestamp"), col("requestId"),
        col("ins.insertionId").as("insertionId"),
        col("ins.contentId").as("contentId"))
    Outputs(Validation.clearUserId(views), Validation.clearUserId(dlogs),
      Validation.clearUserId(imps), Validation.clearUserId(acts), luu,
      dlogIds, respInsIds)
  }
}
