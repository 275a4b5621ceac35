package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent → (OS family, agent family) extraction for the device count
  * dimensions (reference parses with the public ua_parser/uap-core library,
  * P:job/counter/CounterKeys.java:43,146-151; the family vocabulary here
  * follows uap-core's, the match rules are a compact deterministic subset).
  *
  * Pure codegen'd CASE/rlike chains — no UDF, whole-stage-codegen friendly,
  * one compiled regex per branch per task. Order matters: more specific
  * tokens (Edge, CriOS, Mobile) are tested before the generic ones they
  * embed (Chrome, Safari).
  */
object UserAgents {

  val OtherFamily = "Other"

  /** uap-core-style OS family. */
  def osFamily(ua: Column): Column =
    when(ua.isNull || ua === "", OtherFamily)
      .when(ua.rlike("Windows Phone"), "Windows Phone")
      .when(ua.rlike("Windows"), "Windows")
      .when(ua.rlike("Android"), "Android")
      .when(ua.rlike("iPhone|iPad|iPod"), "iOS")
      .when(ua.rlike("Mac OS X"), "Mac OS X")
      .when(ua.rlike("CrOS"), "Chrome OS")
      .when(ua.rlike("Linux|X11"), "Linux")
      .otherwise(OtherFamily)

  /** uap-core-style browser/agent family. */
  def agentFamily(ua: Column): Column =
    when(ua.isNull || ua === "", OtherFamily)
      .when(ua.rlike("Edge?/|EdgA/|EdgiOS/"), "Edge")
      .when(ua.rlike("OPR/|Opera"), "Opera")
      .when(ua.rlike("SamsungBrowser/"), "Samsung Internet")
      .when(ua.rlike("CriOS/"), "Chrome Mobile iOS")
      .when(ua.rlike("Chrome/") && ua.rlike("Mobile"), "Chrome Mobile")
      .when(ua.rlike("Chrome/"), "Chrome")
      .when(ua.rlike("FxiOS/"), "Firefox iOS")
      .when(ua.rlike("Firefox/") && ua.rlike("Mobile"), "Firefox Mobile")
      .when(ua.rlike("Firefox/"), "Firefox")
      .when(ua.rlike("Safari/") && ua.rlike("iPhone|iPad|iPod|Mobile"), "Mobile Safari")
      .when(ua.rlike("Safari/"), "Safari")
      .otherwise(OtherFamily)
}
