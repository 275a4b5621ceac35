package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 1
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val got = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 1L),
        "vec_id", "embedding", 3)
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 4L)) // by descending cosine
    assert(got(0)._3 > 990000L)  // cos(1,2) ≈ 0.9939
    assert(math.abs(got(1)._3) < 1000L) // orthogonal ≈ 0
    assert(got(2)._3 < -990000L) // opposite ≈ -1
  }

  test("lshBucketedPairs: identical vectors share a bucket") {
    val dup = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(-5.0f, 1.0f, -2.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.lshBucketedPairs(dup, "vec_id", "embedding", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("tripletMining: nearest same-label positive, nearest other-label hard negative") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.95f, 0.05f, 0.0f), 0),   // positive for 1 (closest, label 0)
      (3L, Array(0.5f, 0.5f, 0.0f), 0),     // same label, further
      (4L, Array(0.9f, 0.1f, 0.0f), 1),     // HARD negative for 1 (closest, label 1)
      (5L, Array(0.0f, 0.0f, 1.0f), 1),     // easy negative, must lose
      (6L, Array(0.0f, 1.0f, 0.0f), 2)      // lone label: no positive → dropped
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.tripletMining(labeled, "vec_id", "embedding",
        "label", labeled.where($"vec_id".isin(1L, 6L)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(5))).toMap
    assert(got.keySet == Set(1L), "anchor 6 has no same-label peer → dropped")
    val (pos, neg, margin) = got(1L)
    assert(pos == 2L, "positive must be nearest same-label")
    assert(neg == 4L, "negative must be the HARD one, not the easy 5")
    assert(margin > 0, "positive outranks the hard negative here")
  }

  test("ivf maintenance: append against the frozen quantizer ≡ rebuild") {
    import org.apache.spark.sql.functions.col
    val all = (0L until 30L).map(i => (i, Array(
      math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat,
      math.sin(i * 0.9 + 1).toFloat, math.cos(i * 1.1 + 2).toFloat)))
      .toDF("vec_id", "embedding")
    val base = all.where(col("vec_id") < 20)
    val adds = all.where(col("vec_id") >= 20)
    val cents = Similarity.defaultIvfCentroids(base, "vec_id", "embedding", 4)
    val root = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      Similarity.ivfAssign(base, "vec_id", "embedding", cents)
        .write.partitionBy("centId").mode("overwrite").parquet(root)
      Similarity.ivfAssign(adds, "vec_id", "embedding", cents)
        .write.partitionBy("centId").mode("append").parquet(root)
      val queries = all.where(col("vec_id") < 5)
      val viaIndex = Similarity.ivfSearchIndex(spark.read.parquet(root),
        queries, "vec_id", "embedding", k = 2, nProbe = 2, cents)
      val rebuilt = Similarity.ivfTopK(all, queries, "vec_id", "embedding",
        k = 2, nProbe = 2, nLists = 4, centroids = Some(cents))
      assert(viaIndex.orderBy("qid", "rank").collect().toSeq ==
        rebuilt.orderBy("qid", "rank").collect().toSeq)
      // the read side must prune to probed lists at planning/run time:
      // the list-partitioned scan carries a dynamic pruning expression
      val p = viaIndex.queryExecution.executedPlan.toString.toLowerCase
      assert(p.contains("dynamicpruning"), p.take(3000))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }

  test("silhouetteSimplifiedE6: hand-computed two-cluster case") {
    import org.apache.spark.sql.functions.col
    // e3 grid: A = {(1000,1000), (1200,1000)} centroid (1100,1000);
    //          B = {(2000,1000), (2000,1200)} centroid (2000,1100).
    val df = Seq(
      (1L, Array(0.0f, 0.0f), "A"), (2L, Array(0.2f, 0.0f), "A"),
      (3L, Array(1.0f, 0.0f), "B"), (4L, Array(1.0f, 0.2f), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.silhouetteSimplifiedE6(df, "vec_id", "embedding",
        "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDecimal(4).toBigInteger.longValue, r.getLong(5)))).toMap
    // A: s = {990099, 984615} → sum 1974714, mean 987357; no misplaced
    assert(got("A") == ((2L, 2L, 0L, 1974714L, 987357L)), s"got $got")
    // B: s = {987654, 988235} → sum 1975889, mean 987944 (trunc .5)
    assert(got("B") == ((2L, 2L, 0L, 1975889L, 987944L)), s"got $got")
    // single-label corpus: b undefined → scored 0, mean NULL
    val solo = Similarity.silhouetteSimplifiedE6(
      df.where(col("label") === "A"), "vec_id", "embedding", "label")
      .collect().head
    assert(solo.getLong(2) == 0L && solo.isNullAt(5))
  }

  test("daviesBouldinE6: scatters, worst peer, and the degenerate count") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), "A"), (2L, Array(0.2f, 0.0f), "A"),
      (3L, Array(1.0f, 0.0f), "B"), (4L, Array(1.0f, 0.2f), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.daviesBouldinE6(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getLong(5)))).toMap
    // s2 = 10000 both; m² = 900² + 100² = 820000;
    // R·1e6 = 20000·1e6 div 820000 = 24390
    assert(got("A") == ((2L, 10000L, "B", 24390L, 0L)), s"got $got")
    assert(got("B") == ((2L, 10000L, "A", 24390L, 0L)), s"got $got")
    // coincident centroids → NULL term, counted loudly
    val dup = Seq((1L, Array(0.5f, 0.5f), "A"), (2L, Array(0.5f, 0.5f), "B"))
      .toDF("vec_id", "embedding", "label")
    val deg = Similarity.daviesBouldinE6(dup, "vec_id", "embedding", "label")
      .collect().map(r => (r.getString(0), r.isNullAt(4), r.getLong(5)))
      .sortBy(_._1)
    assert(deg.toSeq == Seq(("A", true, 1L), ("B", true, 1L)))
  }

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // vectors clustered along (0.6, 0.8) with small deterministic jitter
    val rows = (1 to 200).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f // direction sign-symmetric
      val j = (i % 7 - 3) * 0.01f
      (i.toLong, Array(0.6f * s + j, 0.8f * s - j))
    }
    val r = Similarity.powerIterationTopComponent(
      rows.toDF("vec_id", "embedding"), "embedding", rounds = 8)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // max-norm puts the larger component at ±1e6; ratio ≈ 0.6/0.8
    val ratio = math.abs(r(0L).toDouble / r(1L))
    assert(math.abs(ratio - 0.75) < 0.05, s"ratio $ratio, v=$r")
    assert(math.abs(r(1L)) == 1000000L)
  }

  test("power iteration is a fixed point on an axis-aligned Gram") {
    import spark.implicits._
    // diag-dominant: all mass on dim 1
    val rows = (1 to 50).map(i => (i.toLong, Array(0.001f, 0.9f)))
    val r = Similarity.powerIterationTopComponent(
      rows.toDF("vec_id", "embedding"), "embedding", rounds = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1000000L)
    assert(math.abs(r(0L)) < 5000, r.toString) // ≈ 0.001/0.9 in e6
  }

  test("calinskiHarabaszE6: hand 1-D labels; degenerate k=1 → NULL") {
    import spark.implicits._
    // grid: A → 1000, 1200 (centroid 1100); B → 500, 300 (centroid
    // 400); global 750. W = 4·100² = 40000;
    // B = 2·350² + 2·350² = 490000 → ch = 490000·2·1e6/40000
    val emb = Seq(
      (1L, Array(0.0f), "A"), (2L, Array(0.2f), "A"),
      (3L, Array(-0.5f), "B"), (4L, Array(-0.7f), "B"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.calinskiHarabaszE6(emb, "vec_id", "embedding",
      "label").collect().head
    assert(got.getLong(0) == 4L && got.getLong(1) == 2L)
    assert(BigInt(got.getDecimal(2).toBigInteger) == 490000)
    assert(BigInt(got.getDecimal(3).toBigInteger) == 40000)
    assert(got.getLong(4) == 24500000L)

    val one = Seq((1L, Array(0.1f), "A"), (2L, Array(0.3f), "A"))
      .toDF("vec_id", "embedding", "label")
    val g1 = Similarity.calinskiHarabaszE6(one, "vec_id", "embedding",
      "label").collect().head
    assert(g1.isNullAt(4))
  }

  test("mmrRerankE6: redundancy demotes the near-duplicate; the mmr " +
      "identity holds row by row") {
    import spark.implicits._
    // 0 = query (1,0); 1 identical (rel 1e6); 2 similar to both;
    // 3 orthogonal (rel 0, diverse)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.8f, 0.6f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.mmrRerankE6(emb, "vec_id", "embedding",
      queryId = 0L, poolK = 3, selectK = 3).orderBy("pick_rank")
      .collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.head.getLong(2) == 1000000L) // identical vector
    assert(rows.head.getLong(3) == 0L)       // first pick: maxsim 0
    rows.foreach { r =>
      val (rel, ms, mmr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mmr == (7L * rel - 3L * ms) / 10L)
    }
    // the diverse orthogonal pick carries negative MMR (redundancy-
    // free but irrelevant), still selected last
    assert(rows.last.getLong(4) <= 0L)
  }
}
