package graft.sql

import graft.SparkSpec
import graft.jobs.ContentMetricsJob
import graft.sources.FakeLogGenerator
import org.apache.spark.sql.functions._

/** The SQL form must agree with the DataFrame form on the shared metric
  * columns — same inputs, same totals per (content, hour). */
class ContentMetricsSqlSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("SQL rollup agrees with the DataFrame job") {
    val env = FakeLogGenerator.generate(FakeLogGenerator.Options(users = 4))
      .toDS().toDF()
    val dfForm = ContentMetricsJob.hourly(env)
      .select("window_start_ms", "platformId", "contentId",
        "view_count", "impression_count", "purchase_count", "gmv_usd_micros")

    val unified = ContentMetricsJob.unifiedEvents(env)
    // project the three typed inputs the SQL form expects
    val views = unified.where(col("view_count") === 1)
      .select("platformId", "contentId", "tsMs")
    val imps = unified.where(col("impression_count") === 1)
      .select("platformId", "contentId", "tsMs")
    val acts = graft.sources.LogRequestSplit.actions(env).toDF()
      .withColumn("ci", explode_outer(col("cart")))
      .select(col("platformId"),
        coalesce(when(col("ci.contentId") =!= "", col("ci.contentId")),
          col("contentId")).as("contentId"),
        col("timing.eventApiTimestamp").as("tsMs"), col("actionType"),
        coalesce(col("ci.quantity"), lit(0L)).as("quantity"),
        coalesce(col("ci.priceMicrosPerUnit"), lit(0L)).as("priceMicrosPerUnit"))
    val sqlForm = ContentMetricsSql.hourly(spark, views, imps, acts)
      .select("window_start_ms", "platformId", "contentId",
        "view_count", "impression_count", "purchase_count", "gmv_usd_micros")

    val key = Seq("window_start_ms", "platformId", "contentId")
    assert(dfForm.exceptAll(sqlForm).isEmpty && sqlForm.exceptAll(dfForm).isEmpty,
      s"df=${dfForm.count()} sql=${sqlForm.count()} key=$key")
  }
}
