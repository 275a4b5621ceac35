package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023): the kept/dropped verdicts must match a
  * from-scratch in-test replay of the whole method — trained-centroid
  * assignment, ε-similarity and the keep-farthest-from-centroid tournament —
  * using the same quantized-integer arithmetic. */
class SemDedupSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def roundAway(v: Double): Long =
    if (v < 0) -Math.round(-v) else Math.round(v)
  private def dotE9(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0L; var i = 0
    while (i < math.min(a.length, b.length)) {
      acc += roundAway(a(i).toDouble * b(i).toDouble * 1e9); i += 1
    }
    acc
  }
  private def cosE6(a: Array[Float], b: Array[Float]): Long =
    roundAway(dotE9(a, b).toDouble /
      math.sqrt(dotE9(a, a).toDouble * dotE9(b, b).toDouble) * 1e6)

  /** (id → vec), collected once; 500 rows at this SF. */
  private lazy val vecs: Map[Long, Array[Float]] = emb.select("vec_id", "embedding")
    .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("semDedup matches a brute-force replay of assignment + tournament") {
    val eps = 400000L
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 16, iters = 2, minCosE6 = eps)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size == vecs.size)

    // replay assignment from the (deterministic) trained centroids
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 2, metric = "cosine")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val expAssign = vecs.map { case (id, v) =>
      val (cid, cs) = cents.map { case (c, cv) =>
        val cos = dotE9(v, cv).toDouble /
          math.sqrt(dotE9(v, v).toDouble * dotE9(cv, cv).toDouble)
        (c, cos)
      }.toSeq.minBy { case (c, cos) => (-cos, c) }
      id -> ((cid, roundAway(cs * 1e6)))
    }
    out.foreach { case (id, (cluster, csE6, _)) =>
      assert((cluster, csE6) == expAssign(id), s"assignment of $id")
    }

    // replay the tournament: drop iff an ε-similar cluster-mate has a
    // strictly lower (cent_sim, id) key
    out.foreach { case (id, (cluster, csE6, kept)) =>
      val eliminators = expAssign.collect {
        case (oid, (oc, ocs)) if oid != id && oc == cluster &&
          (ocs < csE6 || (ocs == csE6 && oid < id)) &&
          cosE6(vecs(id), vecs(oid)) >= eps => oid
      }
      assert(kept == eliminators.isEmpty,
        s"id=$id kept=$kept but eliminators=${eliminators.take(3)}")
    }
    // the threshold genuinely splits this corpus
    val keptN = out.values.count(_._3)
    assert(keptN > 0 && keptN < vecs.size, s"degenerate split $keptN")
  }

  test("semDedup is deterministic across runs") {
    def run() = Similarity.semDedup(emb, "vec_id", "embedding", 16, 2, 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(run() == run())
  }

  test("threshold extremes: impossible ε keeps all; ε = -1e6 keeps one per cluster") {
    val all = Similarity.semDedup(emb, "vec_id", "embedding", 16, 2, 1000001L)
    assert(all.where(!col("kept")).count() == 0)

    val one = Similarity.semDedup(emb, "vec_id", "embedding", 16, 2, -1000000L)
      .groupBy("cluster").agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("k"),
        count(lit(1)).as("n")).collect()
    one.foreach { r =>
      assert(r.getLong(1) == 1L, s"cluster ${r.getLong(0)}: ${r.getLong(1)} kept")
    }
  }
}
