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

  test("containmentPairs: directed, catches short-doc-inside-long-doc Jaccard misses") {
    // doc 6 is doc 5's opening third: containment(6→5) = 1 but Jaccard
    // is small, so the symmetric measure misses it at t = 1/2
    val cdocs = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (6L, "alpha beta gamma delta epsilon zeta"),
      (7L, "unrelated words entirely elsewhere in vocabulary space now")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(cdocs, "doc_id", "text", 3, 1L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((6L, 5L)), "short-in-long containment missed")
    assert(!got.contains((5L, 6L)), "containment must stay directed")
    assert(!got.exists { case (a, b) => a == 7L || b == 7L })
    val jac = Dedup.ngramJaccardPairs(cdocs, "doc_id", "text", 3, 1L, 2L)
      .collect()
    assert(jac.isEmpty, "fixture should be invisible to symmetric Jaccard")
  }

  test("containmentPairs matches brute force on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val docs2 = (0L until 20L).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs2.toDF("doc_id", "text").repartition(5)
      for ((num, den) <- Seq((1L, 2L), (3L, 4L))) {
        val got = Dedup.containmentPairs(df, "doc_id", "text", 2, num, den)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
        // brute: distinct word 2-grams per doc, all directed pairs
        val sets = docs2.map { case (i, t) =>
          val toks = t.split("\\s+").toSeq
          i -> toks.sliding(2).map(_.mkString(" ")).toSet
        }.toMap
        val brute = (for {
          (a, sa) <- sets; (b, sb) <- sets
          if a != b && sa.nonEmpty
          inter = (sa & sb).size.toLong
          if inter * den >= sa.size.toLong * num
        } yield (a, b) -> (inter, sa.size.toLong, sb.size.toLong)).toMap
        assert(got == brute, s"trial=$trial t=$num/$den")
      }
    }
  }

  test("winnowingFingerprints match the sequential MOSS-rule mirror") {
    import graft.functions.RollingHash
    val k = 3; val w = 4
    def mirror(text: String): Set[(Long, Long)] = {
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.length < k) return Set.empty
      val hs = (0 to tk.length - k).map(i =>
        RollingHash.polyHash64(
          tk.slice(i, i + k).mkString(" ").getBytes("UTF-8")) >>> 1)
      val ng = hs.length
      (1 to math.max(1, ng - w + 1)).map { ws =>
        val win = (ws to math.min(ws + w - 1, ng)).map(p => (hs(p - 1), p))
        val m = win.minBy { case (h, p) => (h, -p) }
        (m._1, m._2.toLong)
      }.toSet
    }
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words appear in this sentence here"),
      (5L, "tiny doc"),                     // < k words → no fingerprints
      (6L, "exactly three words"))          // ng=1 < w → one window
    val got = Dedup.winnowingFingerprints(texts.toDF("doc_id", "text"),
        "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    texts.foreach { case (id, tx) =>
      val exp = mirror(tx)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id")
    }
    // docs 1 and 2 share the 9-word prefix ≥ w+k−1 = 6 → the winnowing
    // guarantee promises ≥ 1 shared fingerprint
    val pairs = Dedup.winnowingSharedPairs(
      Dedup.winnowingFingerprints(texts.toDF("doc_id", "text"),
        "doc_id", "text", k, w), minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("crossSourceDuplicates: md5 fingerprints, >=2-source census") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, "x"), ("a", 2L, "y"),
      ("b", 1L, "x"),                 // duplicate of a's (1, x)
      ("b", 2L, "y"), ("b", 2L, "y"), // two b-copies of a's (2, y)
      ("b", 3L, "z"))                 // b-only
      .toDF("src", "k", "v")
    val got = Dedup.crossSourceDuplicates(rows, "src", Seq("k", "v"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    // (1,x): 2 sources 2 rows; (2,y): 2 sources 3 rows; (3,z) filtered
    assert(got == Seq((2L, 2L), (2L, 3L)))
    // separator prevents field-boundary collisions: ("ab","c") vs ("a","bc")
    val tricky = Seq(("a", "ab", "c"), ("b", "a", "bc")).toDF("src", "k", "v")
    assert(Dedup.crossSourceDuplicates(tricky, "src", Seq("k", "v"))
      .collect().isEmpty)
  }
}
