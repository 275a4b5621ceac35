package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.JoinSideEvent
import graft.sources.{LogRequestSplit, Validation}
import graft.streaming.InferredJoin

/** Flat Output ("join") Job, batch form (reference
  * P:job/join/FlatOutputJob.java, SURVEY §3.1): validates the typed
  * streams, projects them to tiny join skeletons, runs the
  * insertion→impression and impression→action inferred joins, and
  * re-attaches full details (MergeDetails, J6) via id joins.
  *
  * Scale notes: only TinyEvent-width columns enter the stateful joins; the
  * detail re-attachment is an equi join on the event pk, which Spark plans
  * as a shuffled hash/sort-merge join keyed on the id — per-key state never
  * holds payloads (the reference's core state-size optimization,
  * P:README.md:118-119).
  */
object FlatOutputJob {

  case class Outputs(
      joinedImpressions: DataFrame, // insertion ⋈ impression (+details)
      joinedActions: DataFrame, // impression ⋈ action (+details)
      droppedImpressions: DataFrame,
      droppedActions: DataFrame,
      validationErrors: DataFrame)

  private def ts(c: String = "timing.eventApiTimestamp") = col(c)

  def run(envelopes: DataFrame, insImpWindowMs: Long = 30 * 60 * 1000L,
      impActWindowMs: Long = 24 * 3600 * 1000L, outOfOrderMs: Long = 1000L)(
      implicit spark: SparkSession): Outputs = {
    import spark.implicits._

    val dlogsAll = LogRequestSplit.deliveryLogs(envelopes).toDF()
    val impsAll = LogRequestSplit.impressions(envelopes).toDF()
    val actsAll = LogRequestSplit.actions(envelopes).toDF()

    val dlogs = Validation.valid(dlogsAll, Validation.deliveryLogRules)
    val imps = Validation.valid(impsAll, Validation.impressionRules)
    val acts = Validation.valid(actsAll, Validation.actionRules)
    val errors = Validation.errors(dlogsAll, Validation.deliveryLogRules)
      .select(lit("delivery_log").as("record_type"), col("error"))
      .unionByName(Validation.errors(impsAll, Validation.impressionRules)
        .select(lit("impression").as("record_type"), col("error")))
      .unionByName(Validation.errors(actsAll, Validation.actionRules)
        .select(lit("action").as("record_type"), col("error")))

    // J2-style insertion fan-out: DeliveryLog → one tiny row per insertion
    val tinyInsertions = dlogs.select(col("platformId"),
        col("userInfo.logUserId").as("logUserId"), ts().as("tsMs"),
        col("request.requestId").as("requestId"),
        explode(col("insertions")).as("ins"))
      .select(col("platformId"), col("logUserId"), col("tsMs"),
        col("ins.insertionId").as("id"))

    // insertion → impression (J3): FK = impression.insertionId, may be ""
    val insSide = tinyInsertions.select(col("platformId"), col("logUserId"),
      lit(0).as("side"), col("id"), lit("").as("parentId"), col("tsMs"))
    val impSide = imps.select(col("platformId"),
      col("userInfo.logUserId").as("logUserId"), lit(1).as("side"),
      col("impressionId").as("id"), col("insertionId").as("parentId"),
      ts().as("tsMs"))
    val insImp = InferredJoin.joinBatch(
      insSide.unionByName(impSide).as[JoinSideEvent], insImpWindowMs, outOfOrderMs)

    // impression → action (J4): FK = action.impressionId
    val impLeft = insImp.toDF().where(col("matchType") =!= "dropped")
      .select(col("platformId"), col("logUserId"), lit(0).as("side"),
        col("rightId").as("id"), lit("").as("parentId"), col("rightTs").as("tsMs"))
    val actSide = acts.select(col("platformId"),
      col("userInfo.logUserId").as("logUserId"), lit(1).as("side"),
      col("actionId").as("id"), col("impressionId").as("parentId"), ts().as("tsMs"))
    val impAct = InferredJoin.joinBatch(
      impLeft.unionByName(actSide).as[JoinSideEvent], impActWindowMs, outOfOrderMs)

    // J6 MergeDetails: re-attach full payloads by pk
    val joinedImpressions = insImp.toDF().where(col("matchType") =!= "dropped")
      .select(col("leftId").as("insertionId"), col("rightId").as("impressionId"),
        col("matchType"))
      .join(imps.drop("insertionId"), Seq("impressionId"), "left")
    val joinedActions = impAct.toDF().where(col("matchType") =!= "dropped")
      .select(col("leftId").as("impressionId"), col("rightId").as("actionId"),
        col("matchType"))
      .join(acts.drop("impressionId"), Seq("actionId"), "left")

    Outputs(
      Validation.clearUserId(joinedImpressions),
      Validation.clearUserId(joinedActions),
      insImp.toDF().where(col("matchType") === "dropped"),
      impAct.toDF().where(col("matchType") === "dropped"),
      errors)
  }
}
