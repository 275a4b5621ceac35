package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  /** True rank (1-based count of values ≤ est) in the source data. */
  private def rankOf(sorted: IndexedSeq[Long], est: Long): Long = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (sorted(mid) <= est) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  private def sketchOf(data: Seq[Long], parts: Int, k: Int): String = {
    QuantileSketch.register(spark)
    data.toDF("v").repartition(parts)
      .agg(QuantileSketch.mrlSketch(col("v"), k)).head().getString(0)
  }

  test("rank error stays inside the MRL bound across distributions, orders, partitionings") {
    val n = 10000
    val k = 256
    // generous deterministic-parity bound: (log2(n/k) + 2)/k of n
    val tol = math.ceil(n * (math.log(n.toDouble / k) / math.log(2) + 2) / k).toLong
    val dists: Seq[(String, Seq[Long])] = Seq(
      "uniform" -> (0 until n).map(i => (i * 2654435761L) % 100000L),
      "sorted" -> (0 until n).map(_.toLong),
      "reverse" -> (0 until n).map(i => (n - i).toLong),
      "zipf-ties" -> (0 until n).map(i => (i % 37).toLong))
    for ((name, data) <- dists; parts <- Seq(1, 8, 32)) {
      val sorted = data.sorted.toIndexedSeq
      val summary = sketchOf(data, parts, k)
      // total weight must be exactly n — compaction preserves mass
      assert(QuantileSketch.parse(summary).map(_._2).sum == n.toLong,
        s"$name parts=$parts: weight lost")
      for (p <- Seq(1, 10, 50, 90, 99)) {
        val est = QuantileSketch.estimate(summary, Seq(p)).head
        val target = (n.toLong * p + 99L) / 100L
        val r = rankOf(sorted, est)
        assert(math.abs(r - target) <= tol,
          s"$name parts=$parts p=$p: rank $r vs target $target (tol $tol)")
      }
    }
  }

  test("small inputs (n < k) answer exactly") {
    val data = Seq(9L, 1L, 5L, 3L, 7L)
    val summary = sketchOf(data, 3, 64)
    // all weights 1 → estimates are the exact discrete quantiles
    assert(QuantileSketch.estimate(summary, Seq(20, 50, 100)) ==
      Seq(1L, 5L, 9L))
  }

  test("per-group sketches via groupBy, nulls ignored") {
    QuantileSketch.register(spark)
    val df = ((0 until 100).map(i => ("a", Some(i.toLong))) ++
      Seq(("a", None)) ++ (0 until 10).map(i => ("b", Some(i * 10L))))
      .toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(QuantileSketch.mrlSketch(col("v"), 64).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(QuantileSketch.parse(got("a")).map(_._2).sum == 100L)
    assert(QuantileSketch.estimate(got("b"), Seq(50)).head == 40L)
  }
}
