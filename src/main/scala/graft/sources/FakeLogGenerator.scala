package graft.sources

import graft.schema._

/** Deterministic LogRequest generator mirroring the reference's fake-data
  * factory scenario knobs (P:common/fakedatagenerator/LogRequestFactory
  * .java:51-166: users × sessions × views × requests × insertions ×
  * impressions × actions, incrementing UUID-ish ids).
  *
  * Pure function of Options — the job golden tests rely on byte-stable
  * output across runs (the reference pins the same invariant for its
  * MiniCluster tests, SURVEY §5).
  */
object FakeLogGenerator {

  case class Options(
      platformId: Long = 1L,
      users: Int = 4,
      viewsPerUser: Int = 2,
      requestsPerView: Int = 1,
      insertionsPerRequest: Int = 5,
      impressionsPerInsertion: Int = 1,
      actionsPerImpression: Int = 1,
      startMs: Long = 1700000000000L,
      stepMs: Long = 1000L,
      // fraction knobs, deterministic by index: every Nth impression is
      // missing its insertion FK (exercises inferred joins); every Nth
      // action is a cart purchase
      missingFkEvery: Int = 5,
      cartActionEvery: Int = 3,
      // every Nth request is REPLAY traffic (priority 1 — dropped by the
      // shouldJoin gate; SHADOW at priority 2 still joins,
      // P:common/util/DeliveryLogUtil.java:31-54); every Nth view carries a
      // bot user agent; every Nth request also ships its request insertions
      // in matrix transport form (0 = never)
      replayTrafficEvery: Int = 0,
      botViewEvery: Int = 0,
      matrixEvery: Int = 0)

  private def id(prefix: String, ns: Long): String = f"$prefix-$ns%08d"

  /** One LogRequest per (user, view). */
  def generate(opt: Options): Seq[LogRequest] = {
    var seq = 0L
    def next(): Long = { seq += 1; seq }
    // per-entity ordinals: the every-Nth knobs count entities of their own
    // kind, independent of how many ids the other kinds consumed
    var viewOrd = 0L; var reqOrd = 0L; var impOrd = 0L; var actOrd = 0L
    (0 until opt.users).flatMap { u =>
      val logUserId = id("lu", u)
      val userId = id("u", u)
      (0 until opt.viewsPerUser).map { v =>
        val baseTs = opt.startMs + (u * opt.viewsPerUser + v) * 60L * opt.stepMs
        val viewId = id("v", next())
        viewOrd += 1
        val isBotView = opt.botViewEvery > 0 && viewOrd % opt.botViewEvery == 0
        val ua = if (isBotView) "Googlebot/2.1 (+http://www.google.com/bot.html)"
          else "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"
        val view = View(opt.platformId, UserInfo(userId, logUserId),
          Timing(eventApiTimestamp = baseTs), viewId, s"view-$v", "",
          Device(Browser(ua)))
        val dlogs = (0 until opt.requestsPerView).map { r =>
          val requestId = id("r", next())
          reqOrd += 1
          val isReplay = opt.replayTrafficEvery > 0 && reqOrd % opt.replayTrafficEvery == 0
          val withMatrix = opt.matrixEvery > 0 && reqOrd % opt.matrixEvery == 0
          val ins = (0 until opt.insertionsPerRequest).map { i =>
            ResponseInsertion(id("i", next()), id("c", i % 7), i.toLong)
          }
          val (headers, matrix) =
            if (withMatrix)
              (Seq("contentId", "retrievalRank", "meta.src"),
                ins.map(ri => Seq(ri.contentId, ri.position.toString, "fake")))
            else (Nil, Nil)
          DeliveryLog(opt.platformId, UserInfo(userId, logUserId),
            Timing(eventApiTimestamp = baseTs + 1 * opt.stepMs),
            DeliveryRequest(requestId, id("cr", next()), viewId, s"query $r",
              Device(Browser("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36")),
              ClientInfo(if (isReplay) "REPLAY" else "PRODUCTION"),
              headers, matrix),
            ins)
        }
        val imps = dlogs.flatMap { dl =>
          dl.insertions.zipWithIndex
            .filter { case (_, i) => i < opt.impressionsPerInsertion * dl.insertions.size }
            .take(opt.impressionsPerInsertion * dl.insertions.size)
            .map { case (ri, i) =>
              val n = next()
              impOrd += 1
              val missingFk = opt.missingFkEvery > 0 && impOrd % opt.missingFkEvery == 0
              Impression(opt.platformId, UserInfo(userId, logUserId),
                Timing(eventApiTimestamp = baseTs + 2 * opt.stepMs + i),
                id("imp", n),
                if (missingFk) "" else ri.insertionId,
                ri.contentId, viewId, dl.request.requestId)
            }
        }
        val acts = imps.zipWithIndex
          .filter { case (_, i) => i < opt.actionsPerImpression * imps.size }
          .take(opt.actionsPerImpression * imps.size)
          .map { case (imp, i) =>
            val n = next()
            actOrd += 1
            val isCart = opt.cartActionEvery > 0 && actOrd % opt.cartActionEvery == 0
            Action(opt.platformId, UserInfo(userId, logUserId),
              Timing(eventApiTimestamp = baseTs + 3 * opt.stepMs + i),
              id("a", n), imp.impressionId, imp.insertionId, imp.contentId,
              viewId, imp.requestId,
              if (isCart) ActionType.Purchase else ActionType.Navigate,
              if (isCart) Seq(CartContent(imp.contentId, 2L, 1990000L)) else Nil)
          }
        // children carry empty userInfo/platform sometimes? Keep full for
        // determinism; push-down covered by envelope-only fields below.
        LogRequest(opt.platformId, UserInfo(userId, logUserId),
          Timing(eventApiTimestamp = baseTs),
          users = if (v == 0) Seq(UserRecord(opt.platformId,
            UserInfo(userId, logUserId), Timing(eventApiTimestamp = baseTs))) else Nil,
          views = Seq(view), deliveryLogs = dlogs,
          impressions = imps, actions = acts)
      }
    }
  }
}
