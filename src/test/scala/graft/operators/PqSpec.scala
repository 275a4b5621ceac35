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

  test("caller-trained codebooks plug in (per-subspace IVF centroids)") {
    // train per-subspace centroids with the deterministic L2 Lloyd (PQ
    // assigns by L2, so the trainer must match the metric) and feed them
    // back in — the trained-quantizer path ivfTopK also offers
    val cb: Array[Array[Array[Float]]] = Array.tabulate(8) { m =>
      val subs = emb.select(col("vec_id"),
        slice(col("embedding"), m * 8 + 1, 8).as("sub"))
      Similarity.trainIvfCentroids(subs, "vec_id", "sub", nLists = 16,
          iters = 2, metric = "l2")
        .orderBy(col("centId")).collect()
        .map(_.getSeq[Float](1).toArray)
    }
    def run() = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        3, 8, 16, codebooks = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    assert(got == run() && got.nonEmpty) // deterministic plug-in
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // these synthetic unit vectors have no cluster structure, so trained
    // codebooks can't beat the 4-bit/subspace quantization floor the way
    // they do on real embeddings — assert a loose floor, not superiority
    assert(got.count(truth.contains) >= truth.size / 10)
    // wrong-shape codebooks fail loudly
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, queries, "vec_id", "embedding", 3, 8, 16,
        codebooks = Some(cb.take(4)))
    }
    // the one-job-per-iteration all-subspace trainer is ARITHMETICALLY
    // identical to the per-subspace Lloyd runs above — bit-equal books
    val combined = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      subspaces = 8, codebookSize = 16, iters = 2)
    assert(combined.length == cb.length &&
      combined.zip(cb).forall { case (a, b) =>
        a.length == b.length && a.zip(b).forall { case (x, y) =>
          java.util.Arrays.equals(x, y)
        }
      })
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
