package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** UserAgents parse families (reference counts device dimensions via the
  * public ua_parser, P:job/counter/CounterKeys.java:43,146-151). */
class UserAgentsSpec extends SparkSpec {

  private val cases: Seq[(String, String, String)] = Seq(
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Windows", "Chrome"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
      "Windows", "Edge"),
    ("Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
      "Android", "Chrome Mobile"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Mobile/15E148 Safari/604.1",
      "iOS", "Mobile Safari"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
      "iOS", "Chrome Mobile iOS"),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15",
      "iOS", "Firefox iOS"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
      "Linux", "Firefox"),
    ("Mozilla/5.0 (Android 14; Mobile; rv:120.0) Gecko/120.0 Firefox/120.0",
      "Android", "Firefox Mobile"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Safari/605.1.15",
      "Mac OS X", "Safari"),
    ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome OS", "Chrome"),
    ("Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1; Microsoft; Lumia 950) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/52.0.2743.116 Mobile Safari/537.36 Edge/15.14977",
      "Windows Phone", "Edge"),
    ("Mozilla/5.0 (Linux; Android 13; SM-S908B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
      "Android", "Samsung Internet"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0",
      "Windows", "Opera"),
    ("", "Other", "Other"))

  test("os and agent families parse the fixed vocabulary") {
    import spark.implicits._
    val df = cases.map(_._1).toDF("ua")
      .select(col("ua"), UserAgents.osFamily(col("ua")).as("os"),
        UserAgents.agentFamily(col("ua")).as("agent"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    got.zip(cases).foreach { case ((ua, os, agent), (_, expOs, expAgent)) =>
      assert(os === expOs, s"os for: $ua")
      assert(agent === expAgent, s"agent for: $ua")
    }
  }

  test("null user agent maps to Other") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("ua")
      .select(UserAgents.osFamily(col("ua")).as("os"),
        UserAgents.agentFamily(col("ua")).as("agent"))
    val r = df.collect().head
    assert(r.getString(0) === "Other" && r.getString(1) === "Other")
  }
}
