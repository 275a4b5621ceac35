package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{PolyHash64, RollingHash}

class AmsSketchSpec extends SparkSpec {
  import spark.implicits._

  test("f2AuditE6: exact F2 and the estimator match a sequential " +
      "splitmix mirror") {
    PolyHash64.register(spark)
    val keys = Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L)
    val got = AmsSketch.f2AuditE6(keys.toDF("k"), col("k"),
      groups = 5, reps = 16).collect().head
    // exact F2 = 4 + 1 + 9 + 1 = 15
    assert(got.getDecimal(0).toBigInteger.longValue == 15L)

    // sequential mirror: per key the two hash words, bit-sliced signs,
    // 80 sign sums over the stream, squares, 5 group sums, median/16
    val xs = Array.fill(80)(0L)
    keys.foreach { k =>
      val h0 = RollingHash.splitMix64(k)
      val h1 = RollingHash.splitMix64(k ^ 25214903917L)
      var j = 0
      while (j < 80) {
        val h = if (j < 64) h0 else h1
        val bit = if (j < 64) j else j - 64
        xs(j) += (if (((h >>> bit) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    val groupSums = (0 until 5).map(g =>
      (0 until 16).map(r => BigInt(xs(g * 16 + r)) * xs(g * 16 + r)).sum)
    val est = groupSums.sorted.apply(2) / 16
    assert(BigInt(got.getDecimal(1).toBigInteger) == est)
    assert(got.getLong(2) == ((est - 15).abs * 1000000 / 15).toLong)
  }

  test("f2AuditE6: estimator is unbiased-ish on a uniform stream " +
      "(sanity, deterministic)") {
    PolyHash64.register(spark)
    val keys = (1L to 400L).flatMap(k => Seq.fill(3)(k))
    val got = AmsSketch.f2AuditE6(keys.toDF("k"), col("k")).collect().head
    val exact = BigInt(got.getDecimal(0).toBigInteger)
    val est = BigInt(got.getDecimal(1).toBigInteger)
    assert(exact == BigInt(400) * 9)
    // median-of-means of 5×16 estimators: within a factor of 2 on
    // this fixed stream (deterministic — this is a pinned value test
    // in disguise, loose enough to survive parameter re-tuning)
    assert(est > exact / 2 && est < exact * 2,
      s"est $est vs exact $exact")
  }
}
