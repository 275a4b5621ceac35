package graft.operators

import graft.SparkSpec
import graft.functions.RollingHash

/** Weighted reservoir sampling must match a sequential A-ES reference on
  * the same hash-uniforms, respect weights (heavy items essentially
  * always sampled), and be invariant to partitioning and re-runs. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val salt = "#t#1"
  private val rows: Seq[(Long, String, Long)] =
    (0L until 60L).map(i => (i, if (i % 2 == 0) "a" else "b",
      if (i == 6L || i == 7L) 1000000L else 1L + i % 3))

  private def refSample(k: Int): Set[(String, Long, Long)] = {
    def priority(id: Long, w: Long): Double = {
      val h = RollingHash.polyHash64((id.toString + salt).getBytes("UTF-8"))
      val bits = ((h >> 11) & ((1L << 53) - 1L)) | 1L
      math.log(bits.toDouble / 9007199254740992.0) / w.toDouble
    }
    rows.groupBy(_._2).flatMap { case (g, xs) =>
      xs.sortBy { case (id, _, w) => (-priority(id, w), id) }.take(k)
        .zipWithIndex.map { case ((id, _, _), i) => (g, id, i + 1L) }
    }.toSet
  }

  test("sample matches the sequential A-ES reference per group") {
    val out = CorpusOps.weightedSample(rows.toDF("id", "g", "w"),
        "id", "g", "w", salt, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == refSample(10))
    // the two million-weight items dominate their groups' draws
    assert(out.exists(t => t._2 == 6L) && out.exists(t => t._2 == 7L),
      "heavy-weight items missing from sample")
  }

  test("partition-invariant and stable across re-runs") {
    val df = rows.toDF("id", "g", "w")
    def run(parts: Int) = CorpusOps.weightedSample(df.repartition(parts),
      "id", "g", "w", salt, 5).orderBy("g", "rn").collect().toSeq
    assert(run(1) == run(11))
    assert(run(11) == run(11))
  }
}
