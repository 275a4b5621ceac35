package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 hardening fixtures: the probe-set guards on the valuation/
  * retrieval brute-force ops, the LSH-planner grid-alignment require,
  * internal symmetrization in eccentricityPivots, and the zero-total
  * guard in the Horvitz–Thompson audit. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def embFrame(n: Int) =
    (1 to n).map(i => (i.toLong, i % 2, Array(1.0f, i.toFloat)))
      .toDF("vec_id", "label", "embedding")

  test("knnShapleyE9: probe guard trips loudly on an oversized probe set") {
    val df = embFrame(12)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnShapleyE9(df, "vec_id", "embedding", "label",
        col("vec_id") <= 6L, k = 2, topN = 3, maxProbes = 4L)
    }
    assert(e.getMessage.contains("probe set has 6"))
  }

  test("retrievalEvalE6: probe guard trips loudly on an oversized probe set") {
    val df = embFrame(12)
    val e = intercept[IllegalArgumentException] {
      Similarity.retrievalEvalE6(df, "vec_id", "embedding", "label",
        col("vec_id") <= 6L, k = 2, (a, b) => a === b, maxProbes = 4L)
    }
    assert(e.getMessage.contains("probe set has 6"))
  }

  test("lshPlannerE6 rejects off-grid and out-of-range thresholds") {
    intercept[IllegalArgumentException] {
      Dedup.lshPlannerE6(spark, signatureSize = 4, thresholdE6 = 123456L)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshPlannerE6(spark, signatureSize = 4, thresholdE6 = 5000L)
    }
    // on-grid still works
    assert(Dedup.lshPlannerE6(spark, signatureSize = 4,
      thresholdE6 = 600000L).count() == 3L)
  }

  test("eccentricityPivots symmetrizes: directed-only path equals the " +
      "pre-symmetrized input") {
    // path 1-2-3-4 given ONLY in ascending orientation: node 1 (the
    // pivot) must still see ecc 3 / 4 reached, exactly as if the caller
    // had symmetrized
    val directed = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val both = directed.unionByName(
      directed.select(col("d").as("s"), col("s").as("d")))
    val a = Graph.eccentricityPivots(directed, "s", "d",
        nPivots = 4, maxHops = 8)
      .as[(Long, Long, Long)].collect().toSet
    val b = Graph.eccentricityPivots(both, "s", "d",
        nPivots = 4, maxHops = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a == Set((1L, 3L, 4L), (2L, 2L, 4L), (3L, 2L, 4L), (4L, 3L, 4L)))
  }

  test("poissonPpsAudit: all-zero y gives total_err_ppm 0, not NULL") {
    val rows = Seq((1L, 5L, 0L), (2L, 3L, 0L), (3L, 2L, 0L))
    val r = HorvitzThompson.poissonPpsAudit(rows.toDF("u", "s", "y"),
        col("u"), col("s"), col("y"), expectedSample = 100L, salt = "z")
      .select("true_total", "total_hat", "total_err_ppm")
      .as[(Long, Long, Long)].collect()
    assert(r.length == 1)
    assert(r(0) == ((0L, 0L, 0L)))
  }
}
