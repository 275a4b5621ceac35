package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 10)

  test("pqTopK: an exact duplicate vector is its twin's rank-1 hit") {
    // duplicate doc 400 as id 9000 — identical subvectors quantize to
    // identical codes, so ADC(query=400, cand=9000) is the maximal score
    val dup = emb.unionByName(
      emb.where(col("vec_id") === 400).withColumn("vec_id", lit(9000L)))
    val got = Similarity.pqTopK(dup, dup.where(col("vec_id") === 400),
        "vec_id", "embedding", k = 1, subspaces = 8, codebookSize = 16)
      .select("cid").as[Long].collect()
    assert(got.toSeq == Seq(9000L))
  }

  test("pqTopK recall vs brute force is meaningful; runs are deterministic") {
    def run() = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 3, subspaces = 8, codebookSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    val a = run(); val b = run()
    assert(a == b)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = a.map(t => (t._1, t._3)).count(truth.contains)
    // 16-entry training-free codebooks on random vectors: coarse, but the
    // compressed ranking must still recover a nontrivial share of top-3
    assert(hits >= truth.size / 5, s"recall $hits/${truth.size}")
  }

  test("pqTopK codes are partition-independent (same output after repartition)") {
    val base = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        3, 8, 16).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val shuffled = Similarity.pqTopK(emb.repartition(13), queries, "vec_id",
        "embedding", 3, 8, 16).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(base == shuffled)
  }

  test("pqTopK rejects non-divisible subspace splits and tiny corpora") {
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", 3, 7, 16).collect()
    }
    val tiny = emb.where(col("vec_id") < 4)
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, tiny, "vec_id", "embedding", 3, 8, 16).collect()
    }
  }
}
