package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer-exact Lloyd rounds must match a sequential model doing the
  * identical e3-grid truncating arithmetic, keep empty clusters' previous
  * centroids, and be partition-invariant. */
class KMeansExactSpec extends SparkSpec {
  import spark.implicits._

  // 2-D points in three obvious blobs; ids 0/1/2 seed the centroids
  private val pts: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(0.0f, 0.0f), 1L -> Seq(10.0f, 0.0f), 2L -> Seq(0.0f, 10.0f),
    3L -> Seq(0.5f, 0.2f), 4L -> Seq(9.5f, 0.3f), 5L -> Seq(0.2f, 9.8f),
    6L -> Seq(0.1f, 0.4f), 7L -> Seq(10.2f, 0.1f), 8L -> Seq(0.3f, 10.3f))

  private def model(k: Int, iters: Int): Map[Long, (Long, Long)] = {
    val iq = pts.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000)) }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents = iq.toSeq.sortBy(_._1).take(k)
      .map { case (id, v) => id -> v }.toMap
    def assign(cs: Map[Long, Seq[Long]]): Map[Long, (Long, Long)] =
      iq.map { case (id, v) =>
        val (cid, dist) = cs.toSeq
          .map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dd) => (dd, c) }
        id -> (cid, dist)
      }
    for (_ <- 0 until iters) {
      val a = assign(cents)
      val upd = a.groupBy(_._2._1).map { case (cid, members) =>
        val vs = members.keys.map(iq).toSeq
        val n = vs.size
        cid -> vs.transpose.map(col => {
          val s = col.sum
          // truncating div (matches Spark `div` / DuckDB `//`)
          s / n
        }).toSeq
      }
      cents = cents.map { case (cid, old) => cid -> upd.getOrElse(cid, old) }
    }
    assign(cents)
  }

  test("assignments + inertia match the sequential integer model") {
    for (iters <- Seq(0, 1, 2); parts <- Seq(1, 4)) {
      val df = pts.toDF("vec_id", "embedding").repartition(parts)
      val got = KMeansExact.assign(df, "vec_id", "embedding", 3, iters)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got == model(3, iters), s"iters=$iters parts=$parts")
    }
    // blobs resolve: after 2 rounds, members cluster with their seed
    val fin = model(3, 2)
    assert(Seq(3L, 6L).forall(fin(_)._1 == 0L))
    assert(Seq(4L, 7L).forall(fin(_)._1 == 1L))
    assert(Seq(5L, 8L).forall(fin(_)._1 == 2L))
  }

  test("empty cluster keeps its previous centroid (duplicate seeds)") {
    // seeds 0 and 1 share a position → every point tie-breaks to the
    // lower cid, cluster 1 empties on round 1 and must keep its previous
    // centroid (not crash, not NaN) through round 2
    val rows = Seq(0L -> Seq(5.0f, 5.0f), 1L -> Seq(5.0f, 5.0f),
      2L -> Seq(6.0f, 5.0f))
    val got = KMeansExact.assign(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // round 1: every point tie-breaks to cid 0, cluster 1 empties and
    // KEEPS (5000, 5000); cluster 0 drifts to the trunc mean (5333, 5000).
    // round 2: the retained centroid wins the (5,5) pair back (dist 0 vs
    // 333²) while p2 stays with the drifted one, which re-centers on it.
    // Final: exact-fit assignment — only possible if the empty cluster's
    // centroid survived the round-1 update.
    assert(got == Map(0L -> ((1L, 0L)), 1L -> ((1L, 0L)),
      2L -> ((0L, 0L))), s"got $got")
  }
}
