package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IntervalJoin, Similarity}
import graft.schema.JoinSideEvent
import graft.streaming.InferredJoin

/** Hot-key stress gates — the reference's one published ops lesson is an
  * interval join degrading superlinearly on duplicate event ids
  * (pipeline/README.md:291-304). Each test drives an operator family with
  * a deliberately degenerate key distribution and asserts (a) exactness is
  * preserved against an independent reference computation and (b) the
  * specific lever that bounds the blow-up (time bucketing, prefix
  * filtering, bucket caps, map-side partial aggregation) is engaged.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("bucketedRangeJoin: hot duplicate key stays exact vs the plain range join") {
    // one pathological key with 2000×2000 candidate rows in a tight time
    // span, plus sparse normal keys — the reference's backfill killer
    val left = ((1 to 2000).map(i => ("hot", i.toLong * 100, s"L$i")) ++
      (1 to 200).map(i => (s"k$i", i.toLong * 1000, s"l$i")))
      .toDF("key", "lts", "lid")
    val right = ((1 to 2000).map(i => ("hot", i.toLong * 100 + 50, s"R$i")) ++
      (1 to 200).map(i => (s"k$i", i.toLong * 1000 + 500, s"r$i")))
      .toDF("key", "rts", "rid")

    val bucketed = IntervalJoin.bucketedRangeJoin(
        left, right, Seq("key"), "lts", "rts", lowMs = 0L, highMs = 1000L)
      .select("lid", "rid")
    val plain = left.join(right,
        left("key") === right("key") && right("rts") >= left("lts") &&
          right("rts") <= left("lts") + 1000L)
      .select("lid", "rid")
    // exactness under skew: identical pair sets (bucketing must not dup
    // rows via the multi-bucket explode or drop boundary candidates)
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)
    // the lever: the join key includes the coarse time bucket, so the hot
    // key's rows meet per-bucket, not all-at-once
    val p = bucketed.queryExecution.executedPlan.toString
    assert(p.contains("__b"), p.take(2000))
  }

  test("PPJoin prefix filter: a boilerplate shingle in every doc stays exact") {
    // 150 docs sharing one hot boilerplate phrase (its shingles hit every
    // doc) + 3 true near-dup pairs; a naive shingle self-join would touch
    // ~150²/2 candidate pairs through the hot shingles alone
    val boiler = "this document is provided as is without any warranty of any kind"
    val docs = ((0 until 150).map { i =>
      (i.toLong, s"$boiler unique body $i with words ${"w" + i} ${"x" + i} ${"y" + i} ${"z" + i}")
    } ++ Seq(
      (900L, s"$boiler identical payload alpha beta gamma delta epsilon zeta"),
      (901L, s"$boiler identical payload alpha beta gamma delta epsilon zeta"),
      (902L, s"$boiler identical payload alpha beta gamma delta epsilon eta")))
      .toDF("doc_id", "text")

    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 1L, 2L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    // independent reference: exact 3-shingle Jaccard in plain Scala
    val sets = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> t.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter * 2L >= (sa.size + sb.size - inter) * 1L
    } yield (a, b)).toSet
    assert(got == want)
  }

  test("inferred join: one user owning thousands of events resolves exactly") {
    // hot (platform, logUser) key: 1500 views + 1500 purchases — per-key
    // state must stay (pk → ts) maps, not cross products
    val hot = (1 to 1500).flatMap { i =>
      Seq(
        JoinSideEvent(1L, "hotuser", 0, f"V$i%06d", "", i.toLong * 1000),
        JoinSideEvent(1L, "hotuser", 1, f"P$i%06d", "", i.toLong * 1000 + 400))
    }
    val out = InferredJoin.joinBatch(hot.toDS(), maxTimeMs = 60000L,
      outOfOrderMs = 1000L).collect()
    val matched = out.filter(_.matchType != "dropped")
    assert(matched.length == 1500)
    // nearest-in-time inference: purchase i at t+400 must attach to view i
    matched.foreach { p =>
      assert(p.leftId == "V" + p.rightId.drop(1),
        s"${p.rightId} matched ${p.leftId}")
    }
  }

  test("LSH hot-bucket cap bounds a degenerate cell") {
    // all 400 vectors identical → every one lands in the same bucket on
    // every plane; uncapped that cell is quadratic (79800 pairs)
    val vecs = (0 until 400).map(i => (i.toLong, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.lshBucketedPairs(vecs, "vec_id", "embedding",
      planes = 6, maxBucket = 20)
    val nPairs = capped.count()
    assert(nPairs == 20L * 19 / 2, s"got $nPairs pairs") // 190, not 79800
  }

  test("bigram LM: a stop-word context dominating the corpus stays exact") {
    // natural-language skew: 'the' precedes half of all tokens, so the
    // context-count join key is massively hot. The model-side frames are
    // VOCABULARY-bounded aggregates (the hot context collapses to one row
    // before any join), so the scoring join is hot only on the probe side
    // — a broadcast/AQE concern, never a correctness one. Gate exactness
    // against the sequential model.
    val docs = (0L until 400L).map { i =>
      val w = Seq("the", s"w${i % 17}", "the", s"w${(i * 3) % 11}",
        "the", s"w${(i * 7) % 5}")
      (i, w.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = operators.NgramLm
      .perplexityScore(df, df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // independent sequential model (same add-one bigram arithmetic)
    def pairs(t: String) =
      ("<s>" +: t.split(" ").toSeq).sliding(2).map(p => (p(0), p(1))).toSeq
    val tp = docs.flatMap(d => pairs(d._2))
    val cb = tp.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cu = tp.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = tp.map(_._2).distinct.size.toLong + 1
    docs.foreach { case (id, t) =>
      val lps = pairs(t).map(p => math.round(math.log(
        (cb(p) + 1).toDouble / (cu(p._1) + v).toDouble) * 1e6))
      assert(got(id) == -lps.sum / lps.size, s"doc $id")
    }
    // the lever: the hot context is ONE row in the context-count frame
    val cuFrame = df.select(
        explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .groupBy("t").count()
    assert(cuFrame.where(col("t") === "the").count() == 1L)
  }

  test("hot-key aggregation combines map-side before the shuffle") {
    // 90% of rows on one key: partial aggregation must reduce the hot key
    // to one row per map partition before the exchange
    val events = (1 to 10000).map(i =>
      (if (i % 10 == 0) s"u$i" else "hotuser", 1L)).toDF("user_id", "v")
    val agg = events.groupBy("user_id").agg(sum("v").as("s"))
    val p = agg.queryExecution.executedPlan.toString
    val exchange = p.indexOf("Exchange")
    assert(exchange >= 0 && p.lastIndexOf("HashAggregate") > exchange,
      p.take(2000))
    assert(agg.where(col("user_id") === "hotuser").as[(String, Long)]
      .collect().head._2 == 9000L)
  }
}
