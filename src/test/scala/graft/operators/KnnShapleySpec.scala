package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnShapleySpec extends SparkSpec {
  import spark.implicits._

  // sequential mirror of the Jia et al. recurrence with the operator's
  // pinned e9 truncations (positive div, Δ applied after)
  private def mirror(tests: Seq[(Long, Int, Array[Float])],
      train: Seq[(Long, Int, Array[Float])], k: Int)
      : Map[Long, Long] = {
    def nsq(v: Array[Float]): Long =
      v.map(x => math.rint(x.toDouble * x.toDouble * 1e9).toLong).sum
    def dot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.rint(x.toDouble * y.toDouble * 1e9).toLong }.sum
    val perTest = tests.map { case (_, qlab, qv) =>
      val ranked = train.map { case (cid, clab, cv) =>
        val score = dot(qv, cv).toDouble /
          math.sqrt(nsq(qv).toDouble * nsq(cv).toDouble)
        (cid, clab, score)
      }.sortBy(t => (-t._3, t._1))
      val n = ranked.size
      val m = ranked.map(t => if (t._2 == qlab) 1L else 0L)
      val s = new Array[Long](n)
      s(n - 1) = m(n - 1) * 1000000000L / n
      for (i <- (n - 2) to 0 by -1) {
        val j = i + 1 // 1-based rank of position i
        val mag = (1000000000L * math.min(k, j)) / (k.toLong * j)
        s(i) = s(i + 1) + (m(i) - m(i + 1)) * mag
      }
      ranked.map(_._1).zip(s).toMap
    }
    train.map(_._1).map { cid =>
      val tot = perTest.map(_(cid)).sum
      // BigInt / truncates toward zero, matching div
      cid -> (BigInt(tot) / perTest.size).toLong
    }.toMap
  }

  test("exact values match the sequential recurrence mirror") {
    // two probes, six train points across two labels; vectors chosen so
    // some nearest neighbors are wrong-label (negative values appear)
    val tests = Seq(
      (100L, 0, Array(1.0f, 0.1f)),
      (101L, 1, Array(0.1f, 1.0f)))
    val train = Seq(
      (1L, 0, Array(0.9f, 0.2f)),
      (2L, 1, Array(0.95f, 0.1f)), // wrong-label near probe 100
      (3L, 0, Array(0.2f, 0.9f)),  // wrong-label near probe 101
      (4L, 1, Array(0.1f, 0.95f)),
      (5L, 0, Array(0.7f, 0.7f)),
      (6L, 1, Array(-0.5f, 0.5f)))
    val df = (tests ++ train).toDF("vec_id", "label", "embedding")
    val got = Similarity.knnShapleyE9(df, "vec_id", "embedding", "label",
        col("vec_id") >= 100L, k = 2, topN = 10)
      .select("cid", "phi_e9")
      .as[(Long, Long)].collect().toMap
    val exp = mirror(tests, train, k = 2)
    assert(got == exp, s"got $got\nexp $exp")
    assert(got.values.exists(_ < 0L), "a harmful point must score negative")
  }

  test("rank output is a deterministic top-N with a total order") {
    val tests = Seq((100L, 0, Array(1.0f, 0.0f)))
    val train = (1 to 8).map(i =>
      (i.toLong, i % 2, Array(1.0f / i, 0.5f)))
    val df = (tests ++ train).toDF("vec_id", "label", "embedding")
    val out = Similarity.knnShapleyE9(df, "vec_id", "embedding", "label",
        col("vec_id") >= 100L, k = 3, topN = 4)
      .select("rank", "cid", "phi_e9")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 4)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // ranks descend by value then ascend by cid
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
  }
}
