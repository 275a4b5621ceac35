package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The content-metrics pipeline as literal Spark SQL — the reference's one
  * SQL-driven job executes numbered DDL/DML files over registered tables
  * (P:job/contentmetrics/resources/1_create_unified_event_stream.sql:1-84,
  * 2_create_view_hourly_content_metrics.sql; SURVEY §3.3). This module
  * keeps that shape: register the typed frames as views, run the same
  * UNION-ALL metric encoding and tumbling rollup in SQL. Catalyst plans it
  * identically to the DataFrame form in `jobs/ContentMetricsJob`.
  */
object ContentMetricsSql {

  val unifiedEventStreamSql: String =
    """SELECT platformId, contentId, tsMs,
      | 1L AS view_count, 0L AS impression_count, 0L AS navigate_count,
      | 0L AS add_to_cart_count, 0L AS checkout_count, 0L AS purchase_count,
      | 0L AS gmv_usd_micros
      |FROM view_events
      |UNION ALL
      |SELECT platformId, contentId, tsMs,
      | 0L, 1L, 0L, 0L, 0L, 0L, 0L
      |FROM impression_events
      |UNION ALL
      |SELECT platformId, contentId, tsMs,
      | 0L, 0L,
      | IF(actionType = 2, 1L, 0L),
      | IF(actionType = 4, 1L, 0L),
      | IF(actionType = 8, 1L, 0L),
      | IF(actionType = 3, 1L, 0L),
      | IF(actionType = 3, quantity * priceMicrosPerUnit, 0L)
      |FROM action_cart_events""".stripMargin

  val hourlyRollupSql: String =
    """SELECT tsMs - pmod(tsMs, 3600000) AS window_start_ms,
      | platformId, contentId,
      | sum(view_count) AS view_count,
      | sum(impression_count) AS impression_count,
      | sum(navigate_count) AS navigate_count,
      | sum(add_to_cart_count) AS add_to_cart_count,
      | sum(checkout_count) AS checkout_count,
      | sum(purchase_count) AS purchase_count,
      | sum(gmv_usd_micros) AS gmv_usd_micros,
      | date_format(timestamp_millis(tsMs - pmod(tsMs, 3600000)), 'yyyy-MM-dd') AS dt,
      | date_format(timestamp_millis(tsMs - pmod(tsMs, 3600000)), 'HH') AS hour
      |FROM unified_event_stream
      |GROUP BY 1, 2, 3""".stripMargin

  /** Register inputs and execute the SQL chain.
    * @param viewEvents (platformId, contentId, tsMs)
    * @param impressionEvents (platformId, contentId, tsMs)
    * @param actionCartEvents (platformId, contentId, tsMs, actionType,
    *                          quantity, priceMicrosPerUnit) — pre-exploded
    *                          one row per cart item */
  def hourly(spark: SparkSession, viewEvents: DataFrame,
      impressionEvents: DataFrame, actionCartEvents: DataFrame): DataFrame = {
    viewEvents.createOrReplaceTempView("view_events")
    impressionEvents.createOrReplaceTempView("impression_events")
    actionCartEvents.createOrReplaceTempView("action_cart_events")
    spark.sql(unifiedEventStreamSql).createOrReplaceTempView("unified_event_stream")
    spark.sql(hourlyRollupSql)
  }
}
