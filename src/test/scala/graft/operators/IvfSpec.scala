package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 10)

  test("ivfTopK returns exact scores for whatever it retrieves") {
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(ivf.nonEmpty)
    // every IVF hit's score equals the exact cosine for that pair
    ivf.foreach { case (pair, s) => assert(exact(pair) == s, pair) }
  }

  test("ivfTopK recall against brute force is meaningful and deterministic") {
    def run() = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        3, 16, 4).collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    val a = run(); val b = run()
    assert(a == b) // deterministic
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = a.map(t => (t._1, t._3)).count(truth.contains)
    // unclustered random vectors: probing 4/16 lists should still recover
    // a nontrivial share of the true top-3
    assert(hits >= truth.size / 5, s"recall $hits/${truth.size}")
  }

  test("trained quantizer is deterministic and at least as good as untrained") {
    def train() = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 16, iters = 3)
    val c1 = train().collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    val c2 = train().collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(c1 == c2) // bit-identical across runs (integer-sum means)

    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(cents: Option[org.apache.spark.sql.DataFrame]) =
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 3, 16, 4, cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).count(truth.contains)
    val trained = recall(Some(train()))
    assert(trained >= truth.size / 5, s"trained recall $trained/${truth.size}")
  }
}
