package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.where(col("vec_id") < 10)

  private def run(corpus: org.apache.spark.sql.DataFrame,
      qs: org.apache.spark.sql.DataFrame, k: Int = 3, nProbe: Int = 4) =
    Similarity.ivfPqTopK(corpus, qs, "vec_id", "embedding", k,
      nLists = 16, nProbe = nProbe, subspaces = 8, codebookSize = 16)

  test("ivfPqTopK: an exact duplicate vector is its twin's rank-1 hit") {
    // duplicate doc 400 as id 9000 — identical vectors coarse-assign to
    // the same list and their residuals quantize to identical codes; the
    // encode argmin and the LUT maximize the same per-subspace metric, so
    // the twin attains the maximal ADC score
    val dup = emb.unionByName(
      emb.where(col("vec_id") === 400).withColumn("vec_id", lit(9000L)))
    val got = run(dup, dup.where(col("vec_id") === 400), k = 1)
      .select("cid").as[Long].collect()
    assert(got.toSeq == Seq(9000L))
  }

  test("ivfPqTopK recall vs brute force is meaningful; runs are deterministic") {
    // random unit vectors have no cluster structure, so coarse recall is
    // bounded near nProbe/nLists (a property of the data, not the index —
    // real embeddings cluster and probing recovers far more); probe half
    // the lists here and assert a floor consistent with that bound
    def once() = run(emb, queries, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    val a = once(); val b = once()
    assert(a == b)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = a.map(t => (t._1, t._3)).count(truth.contains)
    // the same loose floor PqSpec's trained case uses: 4-bit subspace
    // quantization of structure-free vectors is near its noise floor
    assert(hits >= truth.size / 10, s"recall $hits/${truth.size}")
    // widening the probe set must never lose candidates the narrow probe
    // found at rank 1 with the same scoring (monotone coarse expansion)
    val narrow = run(emb, queries).collect()
      .filter(_.getInt(2) == 1).map(r => (r.getLong(0), r.getLong(1))).toSet
    val wideTop = a.filter(_._2 == 1).map(t => (t._1, t._3)).toSet
    val narrowScores = run(emb, queries).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val wideScores = run(emb, queries, nProbe = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    // any pair surviving both probe widths scores identically (the ADC
    // scale is per-query-residual, not per-probe-set)
    narrowScores.keySet.intersect(wideScores.keySet).foreach { p =>
      assert(narrowScores(p) == wideScores(p), s"score drift for $p")
    }
    assert(narrow.nonEmpty && wideTop.nonEmpty)
  }

  test("ivfPqTopK is partition-independent (same output after repartition)") {
    val base = run(emb, queries).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val shuffled = run(emb.repartition(13), queries).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(base == shuffled)
  }

  test("candidate join broadcasts the probe LUTs; no cartesian candidate scan") {
    val plan = run(emb, queries).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("trained residual codebooks plug in via ivfResiduals") {
    // the production path: fit the PQ book to the RESIDUAL distribution
    // (what the codes actually encode), not the raw vectors. Exclude the
    // centroid rows — their residuals are exactly zero, and the trainer
    // seeds from the lowest ids, so keeping them collapses every seed
    // (and then every cluster) onto the zero vector
    val resid = Similarity.ivfResiduals(emb, "vec_id", "embedding", nLists = 16)
      .where(col("cid") >= 16)
    val cb = Similarity.trainPqCodebooks(resid, "cid", "cres",
      subspaces = 8, codebookSize = 16, iters = 2)
    def once() = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 8, subspaces = 8, codebookSize = 16,
        codebooks = Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val got = once()
    assert(got.toSeq == once().toSeq && got.nonEmpty)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)).count(truth.contains) >= truth.size / 10)
    // wrong-shape books fail loudly (the ADC stride contract)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 4, subspaces = 8, codebookSize = 16,
        codebooks = Some(cb.take(4)))
    }
  }

  test("ivfPqTopK rejects non-divisible subspace splits and tiny corpora") {
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 4, subspaces = 7, codebookSize = 16).collect()
    }
    // fewer rows than nLists + codebookSize: the residual book can't seed
    val tiny = emb.where(col("vec_id") < 20)
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(tiny, tiny, "vec_id", "embedding", 3,
        nLists = 16, nProbe = 4, subspaces = 8, codebookSize = 16).collect()
    }
  }
}
