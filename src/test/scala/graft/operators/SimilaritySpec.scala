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
}
