package graft.sources

import graft.SparkSpec
import graft.schema._
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("bot user agents match the isbot-derived pattern; real browsers pass") {
    val uas = Seq(
      ("Googlebot/2.1 (+http://www.google.com/bot.html)", true),
      ("curl/8.0 download agent", true), // "download"
      ("python-requests/2.31", true),
      ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36", false),
      ("", false))
    val df = uas.map(_._1).toDF("ua")
      .withColumn("notBot", Filters.isNotBot(col("ua")))
    val got = df.select("ua", "notBot").as[(String, Boolean)].collect().toMap
    uas.foreach { case (ua, isBot) => assert(got(ua) == !isBot, ua) }
  }

  test("traffic priority gates the join") {
    val t = Seq("PRODUCTION", "", "SHADOW", "REPLAY", "LOAD_TEST", "INTERNAL")
      .toDF("t").withColumn("joins", Filters.shouldJoin(col("t")))
      .as[(String, Boolean)].collect().toMap
    assert(t("PRODUCTION") && t("") && t("SHADOW"))
    assert(!t("REPLAY") && !t("LOAD_TEST") && !t("INTERNAL"))
  }

  test("buyer predicate drops rows flagged by any non-buyer sparse hash") {
    val rows = Seq(
      ("keep", Map(1L -> 0L)),
      ("keep2", Map.empty[Long, Long]),
      ("drop", Map(42L -> 1L)),
      ("keep3", Map(42L -> 2L))).toDF("name", "feats")
    val kept = rows.where(Filters.isBuyer(col("feats"), Seq(42L, 43L)))
      .select("name").as[String].collect().toSet
    assert(kept == Set("keep", "keep2", "keep3"))
    // empty hash list keeps everything
    assert(rows.where(Filters.isBuyer(col("feats"), Nil)).count() == 4)
  }

  test("restructure expands the insertion matrix with fast paths + properties") {
    val dl = DeliveryLog(1L, UserInfo("u", "lu"), Timing(1, 2, 3),
      DeliveryRequest("r1", "cr1", "v1", "q",
        insertionMatrixHeaders = Seq("contentId", "retrievalRank", "meta.src", "retrievalScore"),
        insertionMatrix = Seq(
          Seq("c-1", "3", "api", "0.5"),
          Seq("c-2", "7", "cache", "0.25"))))
    val out = Filters.restructureDeliveryLog(Seq(dl).toDS().toDF())
      .select(explode(col("request.requestInsertions")).as("ri"))
      .select("ri.contentId", "ri.retrievalRank", "ri.retrievalScore", "ri.properties")
      .as[(String, Long, Double, Map[String, String])].collect().sortBy(_._1)
    assert(out.length == 2)
    assert(out(0) == (("c-1", 3L, 0.5, Map("meta.src" -> "api"))))
    assert(out(1) == (("c-2", 7L, 0.25, Map("meta.src" -> "cache"))))
    // matrix columns are cleared after restructuring, like the reference
    val cleared = Filters.restructureDeliveryLog(Seq(dl).toDS().toDF())
      .select(size(col("request.insertionMatrix")).as("m"),
        size(col("request.insertionMatrixHeaders")).as("h"))
      .as[(Int, Int)].head()
    assert(cleared == ((0, 0)))
    // matrix-less delivery logs pass through untouched
    val plain = DeliveryLog(1L, UserInfo("u", "lu"), Timing(1, 2, 3),
      DeliveryRequest("r2", "cr2", "v1", "q"),
      Seq(ResponseInsertion("i1", "c1", 0L)))
    val kept = Filters.restructureDeliveryLog(Seq(plain).toDS().toDF())
    assert(kept.select(size(col("request.requestInsertions"))).as[Int].head() == 0)
    assert(kept.select(size(col("insertions"))).as[Int].head() == 1)
  }
}
