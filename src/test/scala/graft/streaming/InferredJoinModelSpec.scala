package graft.streaming

import graft.SparkSpec
import graft.schema.{JoinSideEvent, JoinedPair}

/** Model-based check: the distributed inferred join must agree with a
  * direct per-key reference model on randomized inputs (seeded — failures
  * reproduce). Covers duplicate pks, FK hits/misses, inference ties, and
  * window edges that hand-written cases miss. */
class InferredJoinModelSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private val MaxTime = 1000L
  private val Ooo = 100L

  /** Straight-line per-key model of the batch semantics. */
  private def model(events: Seq[JoinSideEvent]): Map[String, (String, String)] = {
    events.groupBy(e => (e.platformId, e.logUserId)).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e.tsMs, e.side, e.id))
      val lefts = scala.collection.mutable.LinkedHashMap[String, Long]()
      sorted.filter(_.side == 0).foreach(e =>
        if (!lefts.contains(e.id)) lefts(e.id) = e.tsMs)
      sorted.filter(_.side == 1).map { r =>
        if (r.parentId.nonEmpty) {
          if (lefts.contains(r.parentId)) r.id -> (r.parentId, "exact")
          else r.id -> ("", "dropped")
        } else {
          val cand = lefts.toSeq.filter { case (_, lts) =>
            lts >= r.tsMs - MaxTime && lts <= r.tsMs + Ooo }
          if (cand.isEmpty) r.id -> ("", "dropped")
          else {
            val (lid, _) = cand.minBy { case (id, ts) =>
              (math.abs(ts - r.tsMs), ts, id) }
            r.id -> (lid, "inferred")
          }
        }
      }
    }
  }

  private def randomEvents(seed: Long, n: Int): Seq[JoinSideEvent] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val key = s"u${rnd.nextInt(5)}"
      val side = rnd.nextInt(2)
      val leftPool = (0 until 20).map(j => s"L$j")
      val parent =
        if (side == 1 && rnd.nextBoolean()) leftPool(rnd.nextInt(leftPool.size))
        else ""
      val id = if (side == 0) leftPool(rnd.nextInt(leftPool.size)) else s"R$i"
      JoinSideEvent(1L, key, side, id, parent, rnd.nextInt(5000).toLong)
    }
  }

  test("joinBatch agrees with the reference model on random inputs") {
    Seq(1L, 42L, 2026L).foreach { seed =>
      val events = randomEvents(seed, 400)
      val got = InferredJoin.joinBatch(events.toDS(), MaxTime, Ooo)
        .collect().map(p => p.rightId -> (p.leftId, p.matchType)).toMap
      val want = model(events)
      assert(got == want, s"seed=$seed diff=${
        (got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    }
  }
}
