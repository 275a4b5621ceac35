package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Required-field validation with an error side-channel, and PII stripping.
  *
  * Reference: P:common/functions/validate/BaseValidate.java + per-type
  * subclasses — invalid records leave the main stream and land in a
  * ValidationError side table (SURVEY P2, K6); UserInfoUtil.clearUserId
  * strips the authenticated user id before durable output (P8).
  *
  * Spark has no operator side-outputs; the pattern is one tagged pass:
  * `withErrors` adds an `__errors` array column (empty = valid) computed
  * once, and `valid`/`errors` are two filters over it — Catalyst collapses
  * the shared subtree, so the input is scanned once per sink, with the
  * rule evaluation codegen'd.
  */
object Validation {

  /** Rule = (name, predicate-that-must-hold). */
  case class Rule(name: String, holds: Column)

  def viewRules: Seq[Rule] = Seq(
    Rule("missing_log_user_id", col("userInfo.logUserId") =!= ""),
    Rule("missing_view_id", col("viewId") =!= ""))

  def impressionRules: Seq[Rule] = Seq(
    Rule("missing_log_user_id", col("userInfo.logUserId") =!= ""),
    Rule("missing_impression_id", col("impressionId") =!= ""))

  /** Action needs a logUserId and at least one joinable reference
    * (reference ValidateAction.java:19-41, incl. cart contents). */
  def actionRules: Seq[Rule] = Seq(
    Rule("missing_log_user_id", col("userInfo.logUserId") =!= ""),
    Rule("missing_action_id", col("actionId") =!= ""),
    Rule("missing_join_ref",
      col("impressionId") =!= "" || col("insertionId") =!= "" ||
        col("contentId") =!= "" || exists(col("cart"), c => c.getField("contentId") =!= "")),
    Rule("bad_cart_quantity",
      !exists(col("cart"), c => c.getField("quantity") <= 0)))

  def deliveryLogRules: Seq[Rule] = Seq(
    Rule("missing_log_user_id", col("userInfo.logUserId") =!= ""),
    Rule("missing_request_id", col("request.requestId") =!= ""))

  /** User records need the authenticated userId
    * (reference ValidateUser.java:17-28). */
  def userRules: Seq[Rule] = Seq(
    Rule("missing_user_id", col("userInfo.userId") =!= ""))

  /** Adds `__errors: array<string>` of failed rule names. */
  def withErrors(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errs = array(rules.map(r =>
      when(!r.holds, lit(r.name)).otherwise(lit(null))): _*)
    df.withColumn("__errors", filter(errs, e => e.isNotNull))
  }

  def valid(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withErrors(df, rules).where(size(col("__errors")) === 0).drop("__errors")

  /** The side-channel: one row per (record, failed rule). */
  def errors(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withErrors(df, rules).where(size(col("__errors")) > 0)
      .withColumn("error", explode(col("__errors"))).drop("__errors")

  /** PII strip: clear the authenticated userId, keep the log user id
    * (reference UserInfoUtil.clearUserId, P:common/functions/UserInfoUtil
    * .java — applied before Kafka/S3 output). */
  def clearUserId(df: DataFrame): DataFrame =
    df.withColumn("userInfo",
      struct(lit("").as("userId"), col("userInfo.logUserId").as("logUserId")))
}
