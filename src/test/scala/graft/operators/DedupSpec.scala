package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
    (3L, "completely different words appear in this sentence here"),
    (4L, "the quick brown fox jumps over the lazy dog tonight") // exact dup of 1
  ).toDF("doc_id", "text")

  test("keepFirst keeps earliest row per key") {
    val df = Seq(("k1", 10L, 1L), ("k1", 5L, 2L), ("k2", 7L, 3L))
      .toDF("key", "ts_ms", "id")
    val got = Dedup.keepFirst(df, Seq("key"), Seq(col("ts_ms"), col("id")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("k1" -> 2L, "k2" -> 3L))
  }

  test("ngramJaccardPairs finds near-dups and exact dups, skips dissimilar") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("exact dup has full intersection") {
    val row = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 1L, 2L)
      .where(col("a_id") === 1L && col("b_id") === 4L).collect().head
    assert(row.getAs[Long]("inter") == row.getAs[Long]("na"))
    assert(row.getAs[Long]("na") == row.getAs[Long]("nb"))
  }

  test("minHashLshPairs surfaces the same near-dup candidates") {
    val cand = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 8)
      .where(col("matching") * 2 >= col("num_hashes"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 4L))) // identical docs always collide
    assert(cand.contains((1L, 2L)) || cand.contains((2L, 4L))) // high-jaccard pair
    assert(!cand.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simHash: identical docs hash identically, dissimilar docs differ") {
    val h = Dedup.simHash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(4L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) <
      java.lang.Long.bitCount(h(1L) ^ h(3L)))
  }

  test("connectedComponents: chains collapse to the min id; convergence probes work") {
    import spark.implicits._
    // two components: a 5-chain 10-11-12-13-14 and a pair 20-21; the
    // chain needs multiple propagation rounds
    val pairs = Seq((11L, 10L), (11L, 12L), (13L, 12L), (14L, 13L),
      (21L, 20L)).toDF("a_id", "b_id")
    // default: the size gate routes this graph to the driver fast path
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 14L).forall(n => comp(n) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
    // distributed loop (gate disabled) must agree with the fast path
    val dist = Dedup.connectedComponents(pairs, "a_id", "b_id",
      smallGraphMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == comp)
    // maxIter below the rounds needed → non-convergence THROWS by
    // default (silent wrong labels would diverge from the oracle)
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "a_id", "b_id", maxIter = 1,
        smallGraphMaxEdges = 0L)
    }
    // best-effort mode surfaces the partial labels instead
    val early = Dedup.connectedComponents(pairs, "a_id", "b_id", maxIter = 1,
      failOnMaxIter = false, smallGraphMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(early(14L) != 10L)
    // empty pair graph → empty component frame, no NPE (both paths)
    assert(Dedup.connectedComponents(pairs.where(lit(false)), "a_id", "b_id")
      .count() == 0L)
    assert(Dedup.connectedComponents(pairs.where(lit(false)), "a_id", "b_id",
      smallGraphMaxEdges = 0L).count() == 0L)
  }

  test("connectedComponents fast path agrees with a BFS model on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { trial =>
      val n = 5 + rnd.nextInt(50)
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference model: BFS transitive closure, min id per component
        val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
        def reach(s: Long): Set[Long] = {
          var seen = Set(s); var frontier = List(s)
          while (frontier.nonEmpty) {
            val next = frontier.flatMap(adj.getOrElse(_, Nil))
              .filterNot(seen)
            seen ++= next; frontier = next
          }
          seen
        }
        val model = adj.keys.map(k => k -> reach(k).min).toMap
        val got = Dedup.connectedComponents(
            edges.toDF("a_id", "b_id"), "a_id", "b_id")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model, s"trial $trial edges=$edges")
      }
    }
  }
}
