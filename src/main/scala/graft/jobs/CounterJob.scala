package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{CounterFeatures => CF, Windows}

/** Counter Job, batch form (reference P:job/counter/CounterJob.java,
  * SURVEY §3.2): consume joined events, count along the key families
  * (global/content/logUser/user × metric × window), and encode the counts
  * as Redis HSET command frames for the online feature store.
  *
  * Input contract: a DataFrame of joined events with columns
  * platformId, logUserId, userId, contentId, actionType (0 = impression),
  * tsMs. Counts use cart quantity when present (CounterUtil.getCount) —
  * callers pre-explode carts into per-item rows with a `quantity` column.
  *
  * Scale: each family is one partial-aggregated groupBy over the shared
  * projected frame; the windowed variants reuse Windows.slidingCount
  * (map-side combine before the shuffle). Commands are idempotent HSETs,
  * so at-least-once delivery via foreachBatch is safe (reference relies on
  * the same property, SURVEY K3).
  */
object CounterJob {

  private def metricOf(actionType: Int): Long = actionType match {
    case 0 => CF.AggMetric.CountImpression
    case 2 => CF.AggMetric.CountNavigate
    case 3 => CF.AggMetric.CountPurchase
    case 4 => CF.AggMetric.CountAddToCart
    case 8 => CF.AggMetric.CountCheckout
    case _ => CF.AggMetric.CountNavigate
  }

  private val metricCol = {
    val m = Seq(0, 2, 3, 4, 8).map(t => (t, metricOf(t)))
    m.foldLeft(lit(CF.AggMetric.CountNavigate)) { case (acc, (t, f)) =>
      when(col("actionType") === t, lit(f)).otherwise(acc)
    }
  }

  /** Windowed counts for one key family → HSET commands. */
  private def family(events: DataFrame, countType: Long, keyParts: Seq[String],
      windowMs: Long, windowTag: Long, ttlSec: Long): DataFrame = {
    val counts = events
      .groupBy((Windows.bucket(col("tsMs"), windowMs).as("windowStart") +:
        lit(metricCol).as("metric") +: keyParts.map(col)): _*)
      .agg(sum(coalesce(col("quantity"), lit(1L))).as("n"))
    CF.familyCommands(counts, countType,
      keyParts.map(col) :+ col("windowStart").cast("string"),
      col("metric"), lit(windowTag), col("n"), ttlSec)
  }

  /** The full command stream across key families and windows. */
  def commands(events: DataFrame): DataFrame = {
    val hour = 3600 * 1000L
    val day = 24 * hour
    Seq(
      family(events, CF.CountType.Global, Seq("platformId"), hour, CF.CountWindow.Hour, 4 * 3600),
      family(events, CF.CountType.Global, Seq("platformId"), day, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.Content, Seq("platformId", "contentId"), hour, CF.CountWindow.Hour, 4 * 3600),
      family(events, CF.CountType.Content, Seq("platformId", "contentId"), day, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.LogUser, Seq("platformId", "logUserId"), day, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.User, Seq("platformId", "userId"), day, CF.CountWindow.Day, 2 * 86400),
    ).reduce(_ unionByName _)
  }

  /** Last-seen features (reference A4 LastTimeAndCount → Redis). */
  def lastSeenCommands(events: DataFrame, keyParts: Seq[String],
      countType: Long, ttlSec: Long): DataFrame = {
    val last = Windows.lastTimeAndCount(events, keyParts :+ "contentId", "tsMs")
    CF.hsetCommand(
      CF.redisKey((lit(countType.toString) +: keyParts.map(col)): _*),
      concat_ws(CF.Sep, col("contentId"), lit("last")),
      col("last_ts_ms"), ttlSec)(last)
  }

  def run(events: DataFrame)(implicit spark: SparkSession): DataFrame =
    commands(events).unionByName(
      lastSeenCommands(events, Seq("platformId", "logUserId"),
        CF.CountType.LogUser, 90 * 86400))
}
