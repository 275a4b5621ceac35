package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized model-agreement for the streaming ops whose fixed-fixture
  * specs could miss interaction cases: each FMGWS transition is compared
  * against an independently-written relational formulation on dozens of
  * generated datasets. */
class RandomizedParitySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("SeenGate batch ≡ left-semi + bypass on 50 random sets") {
    val rnd = new scala.util.Random(777L)
    for (trial <- 1 to 50) {
      val keys = Seq("a", "b", "c")
      val lefts = (1 to 1 + rnd.nextInt(10)).map(i =>
        SeenGate.Event(keys(rnd.nextInt(3)), 0, s"l$i",
          rnd.nextInt(1000).toLong, rnd.nextBoolean() && rnd.nextBoolean()))
      val rights = (1 to rnd.nextInt(3)).map(i =>
        SeenGate.Event(keys(rnd.nextInt(3)), 1, "", rnd.nextInt(1000).toLong))
      val events = lefts ++ rights
      val gated = SeenGate.gateBatch(events.toDS()).collect().map(_.id).toSet
      // relational: immediates pass; others need their key on the right
      val seenKeys = rights.map(_.key).toSet
      val expected = lefts.filter(l => l.immediate || seenKeys(l.key))
        .map(_.id).toSet
      assert(gated == expected, s"trial $trial: $events")
    }
  }

  test("LastSeen final emission ≡ batch lastTimeAndCount on 30 random sets") {
    val rnd = new scala.util.Random(888L)
    for (trial <- 1 to 30) {
      val events = (1 to 1 + rnd.nextInt(20)).map(i =>
        LastSeen.Event(s"k${rnd.nextInt(3)}", rnd.nextInt(100000).toLong))
      val byKey = events.groupBy(_.key)
      byKey.foreach { case (k, evs) =>
        val (out, _) = LastSeen.advance(k, evs, LastSeen.State(0L, Map.empty, 0L),
          Long.MinValue, 90)
        // the last per-event emission carries (max ts, total count)
        assert(out.last.lastTsMs == evs.map(_.tsMs).max, s"trial $trial")
        assert(out.last.count == evs.size.toLong, s"trial $trial")
        // counts are monotone per event
        assert(out.map(_.count) == (1 to evs.size).map(_.toLong))
      }
    }
  }

  test("UserJoin batch ≡ mergedUpdates + as-of composition on 30 random sets") {
    val rnd = new scala.util.Random(999L)
    for (trial <- 1 to 30) {
      val attrsPool = Seq("uid", "seg")
      val nUpd = 1 + rnd.nextInt(6); val nEv = 1 + rnd.nextInt(6)
      // distinct timestamps: at equal ts the FMGWS merge folds updates in
      // (ts, id) order while the relational window needs its own tie rule
      val ts = rnd.shuffle((1 to 40).toList).map(_ * 100L)
      val updates = (0 until nUpd).map(i =>
        UserJoin.In("k", 0, s"u$i", ts(i),
          attrsPool.filter(_ => rnd.nextBoolean())
            .map(a => a -> (if (rnd.nextBoolean()) s"v$i" else "")).toMap))
      val evs = (0 until nEv).map(i =>
        UserJoin.In("k", 1, s"e$i", ts(nUpd + i), Map.empty))
      val batch = UserJoin.joinBatch((updates ++ evs).toDS(), 100L, 10000L)
        .collect().map(e => e.id -> e.attrs).toMap

      // relational: merged snapshot per update, event as-of joins latest
      val updDf = updates.map(u => (u.key, u.tsMs,
          u.attrs.getOrElse("uid", ""), u.attrs.getOrElse("seg", "")))
        .toDF("key", "uts", "uid", "seg")
      val merged = UserJoin.mergedUpdates(updDf, Seq("key"), "uts", "uts",
        Seq("uid", "seg"))
      val evDf = evs.map(e => (e.key, e.id, e.tsMs)).toDF("key", "id", "tsMs")
      val rel = graft.operators.AsOfJoin.leftAsOf(evDf, merged, Seq("key"),
          "tsMs", "uts", Seq("uid", "seg"), "uts")
        .collect().map { r =>
          val m = Seq("uid" -> r.getAs[String]("uid"),
            "seg" -> r.getAs[String]("seg"))
            .filter { case (_, v) => v != null && v.nonEmpty }.toMap
          r.getAs[String]("id") -> m
        }.toMap
      evs.foreach { e =>
        // FMGWS emits empty attrs for never-enriched; align the shapes
        val got = batch(e.id).filter(_._2.nonEmpty)
        assert(got == rel(e.id), s"trial $trial event ${e.id}: $updates")
      }
    }
  }
}
