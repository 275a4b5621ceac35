package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{CounterFeatures => CF, Windows}
import graft.functions.GraftFunctions

/** Counter Job, batch form (reference P:job/counter/CounterJob.java,
  * SURVEY §3.2): consume joined events, count along the key families
  * (global/content/logUser/user/query/device × metric × window), and encode
  * the counts as Redis HSET command frames for the online feature store.
  *
  * Input contract: a DataFrame of joined events with columns
  * platformId, logUserId, userId, contentId, actionType (0 = impression),
  * tsMs; optionally queryHash (nullable BIGINT, see [[queryHashCol]]),
  * userAgent (string), quantity (cart quantity, CounterUtil.getCount —
  * callers pre-explode carts into per-item rows).
  *
  * The ten key families mirror P:job/counter/CounterKeys.java:40-365:
  * global-device, content-device, user, logUser (windowed counts over
  * HOUR/DAY/DAY_7/DAY_30), query, content×query (same windows, gated by the
  * top-query threshold stream), and the four last-seen families
  * (user/logUser × content/query), each emitting a timestamp field and a
  * 90-day-count field (P:common/counter/FeatureId.java:36-57). Batch rows
  * stay distinct across emit windows by appending the window start to the
  * Redis key (the streaming form overwrites in place instead).
  *
  * Scale: each family is one partial-aggregated groupBy over the shared
  * projected frame (map-side combine before its shuffle); the top-query
  * gate is a broadcast left-semi join (the thresholded hash set is tiny by
  * construction). Commands are idempotent HSETs, so at-least-once delivery
  * via foreachBatch is safe (reference relies on the same property,
  * SURVEY K3).
  */
object CounterJob {

  private val HourMs = 3600 * 1000L
  private val DayMs = 24 * HourMs

  /** One emit window: bucket size, packed window tag, command TTL. */
  final case class Win(sizeMs: Long, tag: Long, ttlSec: Long)

  /** The reference's standard window set (FeatureId.getStandardFeatureIds:
    * HOUR, DAY, DAY_7, DAY_30). */
  val StandardWindows: Seq[Win] = Seq(
    Win(HourMs, CF.CountWindow.Hour, 4 * 3600),
    Win(DayMs, CF.CountWindow.Day, 2 * 86400),
    Win(7 * DayMs, CF.CountWindow.Day7, 14 * 86400),
    Win(30 * DayMs, CF.CountWindow.Day30, 60 * 86400))

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

  /** Normalized search-query hash: lower → blank/over-length → NULL →
    * seed-0 xxhash64 (reference CounterJob.java:399-408 lower + length
    * filter + FlatUtil.getQueryHash). */
  def queryHashCol(query: Column, maxLen: Int = 100): Column =
    when(length(lower(query)).between(1, maxLen),
      GraftFunctions.xxhash64Seed0(lower(query)))

  /** Thresholded top-query hashes (batch analogue of the reference's
    * sliding-window frequency gate, CounterJob.java:400-456: only queries
    * seen >= minCount times get counter rows at all). */
  def topQueryHashes(events: DataFrame, minCount: Long): DataFrame =
    events.where(col("queryHash").isNotNull)
      .groupBy(col("queryHash")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .select("queryHash")

  /** Windowed (windowStart, metric, dims...) → summed count. */
  private def windowed(events: DataFrame, dims: Seq[Column], w: Win): DataFrame =
    events
      .groupBy((Windows.bucket(col("tsMs"), w.sizeMs).as("windowStart") +:
        metricCol.as("metric") +: dims): _*)
      .agg(sum(coalesce(col("quantity"), lit(1L))).as("n"))

  private def overWindows(f: Win => DataFrame): DataFrame =
    StandardWindows.map(f).reduce(_ unionByName _)

  private val wsCol = col("windowStart").cast("string")

  /** User / logUser event counts (CounterKeys USER_EVENT_KEY /
    * LOG_USER_EVENT_KEY: key=(pid, ␝u, user), field=fid). */
  def userCommands(events: DataFrame, userCol: String, countType: Long): DataFrame =
    overWindows { w =>
      val g = windowed(events, Seq(col("platformId").as("pid"), col(userCol).as("u")), w)
      CF.hsetCommand(
        CF.redisKey(col("pid"), lit(CF.UserType), col("u"), wsCol),
        CF.featureIdCol(lit(countType), col("metric"), lit(w.tag)),
        col("n"), w.ttlSec)(g)
    }

  /** Global- and content-device counts (CounterKeys
    * GLOBAL_EVENT_DEVICE_KEY / CONTENT_EVENT_DEVICE_KEY: the parsed
    * os/agent families ride in the hash *field*, not the key; the global
    * family intentionally never expires). `osCol`/`agentCol` are the
    * pre-parsed [[graft.functions.UserAgents]] columns. */
  def deviceCommands(events: DataFrame, withContent: Boolean): DataFrame =
    overWindows { w =>
      val keyDims =
        if (withContent) Seq(col("platformId").as("pid"), col("contentId").as("cid"))
        else Seq(col("platformId").as("pid"))
      val g = windowed(events,
        keyDims ++ Seq(col("osFamily").as("os"), col("agentFamily").as("agent")), w)
      val keyParts =
        if (withContent) Seq(col("pid"), col("cid"), wsCol) else Seq(col("pid"), wsCol)
      val fid = CF.featureIdCol(lit(CF.CountType.ItemDevice), col("metric"), lit(w.tag))
      CF.hsetCommand(
        CF.redisKey(keyParts: _*),
        concat_ws(CF.Sep, col("os"), col("agent"), fid.cast("string")),
        col("n"), if (withContent) w.ttlSec else -1L)(g)
    }

  /** Query and content×query counts (CounterKeys QUERY_EVENT_KEY /
    * CONTENT_QUERY_EVENT_KEY), gated to the thresholded top queries via a
    * broadcast left-semi join. Key carries the hex-encoded hash. */
  def queryCommands(events: DataFrame, topQueries: DataFrame,
      withContent: Boolean): DataFrame = {
    val gated = events.where(col("queryHash").isNotNull)
      .join(broadcast(topQueries), Seq("queryHash"), "left_semi")
    overWindows { w =>
      val keyDims = col("platformId").as("pid") +: col("queryHash").as("qh") +:
        (if (withContent) Seq(col("contentId").as("cid")) else Nil)
      val g = windowed(gated, keyDims, w)
      val hexQ = CF.hexLong(col("qh"))
      val keyParts =
        if (withContent)
          Seq(col("pid"), col("cid"), lit(CF.QueryType), hexQ, wsCol)
        else Seq(col("pid"), lit(CF.QueryType), hexQ, wsCol)
      val countType = if (withContent) CF.CountType.ContentQuery else CF.CountType.Query
      CF.hsetCommand(
        CF.redisKey(keyParts: _*),
        CF.featureIdCol(lit(countType), col("metric"), lit(w.tag)),
        col("n"), w.ttlSec)(g)
    }
  }

  /** Last-seen families (CounterKeys LAST_*_KEY ×4): per
    * (pid, user, content|query, metric), emit a timestamp field
    * (hoursAgo type, window NONE → value = last event ts) and a 90-day
    * count field (count type, window DAY_90 → value = count of events with
    * tsMs > nowMs − 90d), per FeatureId.lastUser*Timestamp/Count. */
  def lastSeenCommands(events: DataFrame, dimCol: Column, dimKeyParts: Column => Seq[Column],
      userCol: String, tsType: Long, countType: Long, nowMs: Long, ttlSec: Long): DataFrame = {
    val in90d = col("tsMs") > nowMs - 90 * DayMs
    val g = events
      .groupBy(col("platformId").as("pid"), col(userCol).as("u"),
        dimCol.as("dim"), metricCol.as("metric"))
      .agg(max(col("tsMs")).as("last_ts_ms"),
        sum(when(in90d, coalesce(col("quantity"), lit(1L))).otherwise(0L)).as("n90"))
    val key = CF.redisKey(
      (col("pid") +: lit(CF.UserType) +: col("u") +: dimKeyParts(col("dim"))): _*)
    CF.hsetCommand(key,
        CF.featureIdCol(lit(tsType), col("metric"), lit(CF.CountWindow.None)),
        col("last_ts_ms"), ttlSec)(g)
      .unionByName(
        CF.hsetCommand(key,
          CF.featureIdCol(lit(countType), col("metric"), lit(CF.CountWindow.Day90)),
          col("n90"), ttlSec)(g))
  }

  private def lastContent(events: DataFrame, userCol: String, tsType: Long,
      countType: Long, nowMs: Long): DataFrame =
    lastSeenCommands(events, col("contentId"), d => Seq(d),
      userCol, tsType, countType, nowMs, 90 * 86400)

  private def lastQuery(events: DataFrame, topQueries: DataFrame, userCol: String,
      tsType: Long, countType: Long, nowMs: Long): DataFrame =
    lastSeenCommands(
      events.where(col("queryHash").isNotNull)
        .join(broadcast(topQueries), Seq("queryHash"), "left_semi"),
      col("queryHash"), d => Seq(lit(CF.QueryType), CF.hexLong(d)),
      userCol, tsType, countType, nowMs, 90 * 86400)

  /** Legacy simplified families (global/content/logUser/user × hour/day)
    * kept for the q29 gate shape. */
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

  /** The simplified command stream across key families and windows. */
  def commands(events: DataFrame): DataFrame = {
    Seq(
      family(events, CF.CountType.Global, Seq("platformId"), HourMs, CF.CountWindow.Hour, 4 * 3600),
      family(events, CF.CountType.Global, Seq("platformId"), DayMs, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.Content, Seq("platformId", "contentId"), HourMs, CF.CountWindow.Hour, 4 * 3600),
      family(events, CF.CountType.Content, Seq("platformId", "contentId"), DayMs, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.LogUser, Seq("platformId", "logUserId"), DayMs, CF.CountWindow.Day, 2 * 86400),
      family(events, CF.CountType.User, Seq("platformId", "userId"), DayMs, CF.CountWindow.Day, 2 * 86400),
    ).reduce(_ unionByName _)
  }

  /** The full ten-family command stream, wired like the reference's
    * defineJob (CounterJob.java:389-500): the four windowed-count families
    * unconditionally, the query-gated families through the top-query
    * threshold, the last-seen families emitting ts + 90d-count pairs. */
  def runAll(events: DataFrame, minQueryCount: Long, nowMs: Long): DataFrame = {
    val top = topQueryHashes(events, minQueryCount)
    Seq(
      deviceCommands(events, withContent = false),
      deviceCommands(events, withContent = true),
      userCommands(events, "logUserId", CF.CountType.LogUser),
      userCommands(events, "userId", CF.CountType.User),
      queryCommands(events, top, withContent = false),
      queryCommands(events, top, withContent = true),
      lastContent(events, "logUserId",
        CF.CountType.LogUserItemHoursAgo, CF.CountType.LogUserItemCount, nowMs),
      lastContent(events, "userId",
        CF.CountType.UserItemHoursAgo, CF.CountType.UserItemCount, nowMs),
      lastQuery(events, top, "logUserId",
        CF.CountType.LogUserQueryHoursAgo, CF.CountType.LogUserQueryCount, nowMs),
      lastQuery(events, top, "userId",
        CF.CountType.UserQueryHoursAgo, CF.CountType.UserQueryCount, nowMs),
    ).reduce(_ unionByName _)
  }

  def run(events: DataFrame)(implicit spark: SparkSession): DataFrame =
    commands(events).unionByName {
      val last = Windows.lastTimeAndCount(events,
        Seq("platformId", "logUserId", "contentId"), "tsMs")
      CF.hsetCommand(
        CF.redisKey(lit(CF.CountType.LogUser.toString), col("platformId"), col("logUserId")),
        concat_ws(CF.Sep, col("contentId"), lit("last")),
        col("last_ts_ms"), 90 * 86400)(last)
    }
}
