package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-join stream filters (SURVEY P4/P5/P6): bot user agents, non-joinable
  * traffic types, non-buyer users, and the insertion-matrix restructuring —
  * all applied before the stateful joins like the reference wires them
  * (P:job/join/FlatOutputJob.java:435-451).
  */
object Filters {

  /** Bot user-agent fragments (P:common/util/BotUtil.java, which inlines the
    * public isbot list, github.com/omrilotan/isbot/blob/main/src/list.json).
    * Matched case-insensitively as a find-anywhere regex. */
  private val botPatterns: Seq[String] = Seq(
    " daum[\\s/]", " deusu/", "(?:^|\\s)site", "@[a-z]", "\\(at\\)[a-z]",
    "\\(github\\.com/", "\\[at\\][a-z]", "^12345", "^<", "^ace explorer",
    "^acoon", "^active", "^ad muncher", "^anglesharp/", "^apple-pubsub/",
    "^astute srm", "^avsdevicesdk/", "^bidtellect/", "^biglotron",
    "^blackboard safeassign", "^blocknote.net", "^braze sender",
    "^camo asset proxy", "^captivenetworksupport", "^castro", "^clamav[\\s/]",
    "^cobweb/", "^coccoc", "^dap ", "^ddg[_-]android", "^discourse",
    "^dispatch/\\d", "^downcast/", "^duckduckgo", "^enigma browser",
    "^evernote clip resolver", "^facebook", "^faraday", "^fdm[\\s/]\\d",
    "^getright/", "^gozilla/", "^hatena", "^hobbit", "^hotzonu", "^hwcdn/",
    "^infox-wisg", "^invision", "^jeode/", "^jetbrains", "^jetty/", "^jigsaw",
    "^linkdex", "^lwp-", "^lwp::simple", "^mailchimp\\.com$", "^metauri",
    "^microsoft bits", "^microsoft data", "^microsoft office existence",
    "^microsoft office protocol discovery",
    "^microsoft windows network diagnostics", "^microsoft-cryptoapi",
    "^microsoft-webdav-miniredir", "^movabletype",
    "^mozilla/\\d\\.\\d \\(compatible;?\\)$", "^my browser$", "^navermailapp",
    "^netsurf", "^node-superagent", "^octopus", "^offline explorer",
    "^ossproxy", "^pagething", "^panscient", "^perimeterx", "^php",
    "^postrank", "^python", "^ramblermail", "^read", "^reed", "^restsharp/",
    "^shareaza", "^shockwave flash", "^smallproxy", "^snapchat",
    "^space bison", "^sprinklr", "^svn", "^swcd ", "^t-online browser",
    "^taringa", "^test certificate info", "^the knowledge ai", "^thinklab",
    "^traackr.com", "^tumblr/", "^vbulletin", "^venus/fedoraplanet", "^w3c",
    "^webbandit/", "^webcopier", "^wget", "^whatsapp", "^www-mechanize",
    "^xenu link sleuth", "^yahoo", "^yandex", "^zdm/\\d", "^zeushdthree",
    "adbeat\\.com", "appinsights", "archive", "ask jeeves/teoma", "bit\\.ly/",
    "bluecoat drtr", "bot", "browsex", "burpcollaborator", "capture", "catch",
    "check", "chrome-lighthouse", "chromeframe", "client", "cloud", "crawl",
    "daemon", "dareboost", "datanyze", "dataprovider", "dejaclick",
    "dmbrowser", "download", "email", "evc-batch/", "feed", "fetch",
    "firephp", "freesafeip", "ghost", "gomezagent", "google",
    "headlesschrome/", "httrack", "hubspot marketing grader", "hydra",
    "ibisbrowser", "images", "index", "ips-agent", "java", "jorgee",
    "library", "mail\\.ru/", "manager", "monitor", "neustar wpm", "news",
    "nutch", "offbyone", "optimize", "pagespeed", "parse", "perl", "phantom",
    "pingdom", "powermarks", "preview", "probe", "ptst[\\s/]\\d", "reader",
    "rigor", "rss", "scan", "scrape", "search", "server", "sogou",
    "sparkler/", "spider", "statuscake", "stumbleupon\\.com", "supercleaner",
    "synapse", "synthetic", "toolbar", "torrent", "tracemyfile", "transcoder",
    "trendsmapresolver", "twingly recon", "url", "valid", "virtuoso",
    "wappalyzer", "webglance", "webkit2png", "websitemetadataretriever",
    "whatcms/", "wordpress", "zgrab")

  val botRegex: String = botPatterns.mkString("|")

  /** True when the user agent is NOT a bot. Empty/unknown/NULL UAs pass (the
    * reference's proto getters never return null — always "" — and only
    * positive matches drop; coalescing NULL to "" keeps the predicate
    * two-valued so a row lands in exactly one of the kept/dropped channels).
    * Codegen'd rlike — one compiled regex per task, no UDF. */
  def isNotBot(userAgent: Column): Column =
    !coalesce(lower(userAgent), lit("")).rlike(botRegex)

  /** Traffic priority (P:common/util/DeliveryLogUtil.java:31-46). */
  def trafficPriority(trafficType: Column): Column =
    when(trafficType.isin("LOAD_TEST", "INTERNAL", "REPLAY"), 1)
      .when(trafficType === "SHADOW", 2)
      .otherwise(3) // PRODUCTION / unknown / unset

  /** shouldJoin gate (P4 companion): only priority > 1 traffic enters the
    * join chain (P:common/util/DeliveryLogUtil.java:48-54). */
  def shouldJoin(trafficType: Column): Column = trafficPriority(trafficType) > 1

  /** BuyerPredicate (P4, P:common/functions/filter/BuyerPredicate.java):
    * keep rows whose execution-insertion sparse features set NONE of the
    * non-buyer-user flags to 1. No-op when the hash list is empty. */
  def isBuyer(sparseFeatures: Column, nonBuyerUserSparseHashes: Seq[Long]): Column =
    nonBuyerUserSparseHashes.foldLeft(lit(true)) { (acc, h) =>
      acc && coalesce(try_element_at(sparseFeatures, lit(h)), lit(0L)) =!= 1L
    }

  /** RestructureDeliveryLog (P6): expand the compact insertion-matrix
    * transport form into request.requestInsertions. Fast-paths contentId /
    * retrievalRank / retrievalScore; other headers land in a properties map
    * keyed by their dotted path (the reference nests structs; a map keyed by
    * the same path is the relational equivalent —
    * P:common/functions/RestructureDeliveryLog.java:14-56). Clears the
    * matrix afterwards, as the reference does. */
  def restructureDeliveryLog(dlogs: DataFrame): DataFrame = {
    val headers = col("request.insertionMatrixHeaders")
    val matrix = col("request.insertionMatrix")
    val hasMatrix = size(headers) > 0 && size(matrix) > 0

    val restructured = transform(matrix, row => {
      // pair each header with its value, bounded by min(|headers|, |row|)
      // like the reference's minSize loop
      val pairs = filter(
        zip_with(headers, slice(row, lit(1), size(headers)),
          (h, v) => struct(h.as("h"), v.as("v"))),
        p => p.getField("v").isNotNull)
      // get() is 0-based and null on out-of-bounds (ANSI-safe)
      def fastPath(name: String): Column =
        get(filter(pairs, p => p.getField("h") === name), lit(0)).getField("v")
      struct(
        coalesce(fastPath("contentId"), lit("")).as("contentId"),
        // try_cast: malformed matrix cells degrade to the defaults instead of
        // failing the whole job under ANSI mode
        coalesce(fastPath("retrievalRank").try_cast("long"), lit(-1L)).as("retrievalRank"),
        coalesce(fastPath("retrievalScore").try_cast("double"), lit(0.0)).as("retrievalScore"),
        map_from_entries(filter(pairs, p =>
          !p.getField("h").isin("contentId", "retrievalRank", "retrievalScore")))
          .as("properties"))
    })

    dlogs.withColumn("request", struct(
      col("request.requestId").as("requestId"),
      col("request.clientRequestId").as("clientRequestId"),
      col("request.viewId").as("viewId"),
      col("request.searchQuery").as("searchQuery"),
      col("request.device").as("device"),
      col("request.clientInfo").as("clientInfo"),
      when(hasMatrix, array().cast("array<string>"))
        .otherwise(col("request.insertionMatrixHeaders")).as("insertionMatrixHeaders"),
      when(hasMatrix, array().cast("array<array<string>>"))
        .otherwise(col("request.insertionMatrix")).as("insertionMatrix"),
      when(hasMatrix, restructured)
        .otherwise(col("request.requestInsertions")).as("requestInsertions")))
  }
}
