package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiTotal(bins: org.apache.spark.sql.DataFrame): Double =
    bins.agg(sum(col("psi_term_e6"))).head().getLong(0) / 1e6

  test("stationary target scores near zero; shifted target alarms") {
    val ref = (0L until 2000L).map(i => (i, i % 100)).toDF("k", "v")
    // same distribution, different rows → ≈ 0
    val same = (5000L until 7000L).map(i => (i, i % 100)).toDF("k", "v")
    val calm = Drift.psiBins(ref, same, col("v"), col("k"), buckets = 10)
    assert(math.abs(psiTotal(calm)) < 0.01, "stationary must be ~0")
    // mass shifted up by 50 → strong drift, and the per-bin terms must
    // localize it: depleted low bins positive via the ln ratio
    val shifted = (0L until 2000L).map(i => (i, i % 100 + 50)).toDF("k", "v")
    val drift = Drift.psiBins(ref, shifted, col("v"), col("k"), buckets = 10)
    assert(psiTotal(drift) > 0.25, s"shift must alarm, got ${psiTotal(drift)}")
    // bin census stays exact
    val rows = drift.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._2).sum == 2000L && rows.map(_._3).sum == 2000L)
  }

  test("ksStatistic: exact D on a hand case, shift alarms, identity is zero") {
    // ref {1,2,3,4}, tgt {3,4,5,6}: D = 1/2 at v=2 → d_num = 2/4·16 = 8
    val ref = Seq(1L, 2L, 3L, 4L).toDF("v")
    val tgt = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Drift.ksStatistic(ref, tgt, col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 8L, 2L)))
    // identical samples → D = 0, witness = smallest value
    val same = Drift.ksStatistic(ref, ref, col("v")).collect().head
    assert(same.getLong(2) == 0L && same.getLong(3) == 1L)
    // strong shift on larger samples → D near n1·n2
    val a = (0L until 500L).map(_ % 50).toDF("v")
    val b = (0L until 400L).map(i => i % 50 + 100).toDF("v")
    val big = Drift.ksStatistic(a, b, col("v")).collect().head
    assert(big.getLong(2) == 500L * 400L, "disjoint supports → D = 1")
  }

  test("bins and terms are partition-invariant") {
    val ref = (0L until 999L).map(i => (i, (i * 7) % 83)).toDF("k", "v")
    val tgt = (0L until 777L).map(i => (i, (i * 11) % 90)).toDF("k", "v")
    def run(parts: Int) =
      Drift.psiBins(ref.repartition(parts), tgt.repartition(parts),
        col("v"), col("k"), buckets = 4).orderBy("bucket").collect().toSeq
    assert(run(1) == run(13))
  }
}
