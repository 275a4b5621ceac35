package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.RollingHash

/** KMV bottom-k and its pairwise intersection counts must match a
  * sequential reference, and the Jaccard estimate must track the true
  * Jaccard within sampling error. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def h(s: String) = RollingHash.polyHash64(s.getBytes("UTF-8"))

  test("bottom-k matches the k smallest distinct reference hashes") {
    val data = (0 until 4000).map(i => ("g" + i % 3, s"v${i % 700}"))
    val got = KmvSketch.bottomK(data.toDF("g", "v"), "g", "v", 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    data.groupBy(_._1).foreach { case (g, rows) =>
      val exp = rows.map(t => h(t._2)).distinct.sorted.take(64)
      assert(got(g) == exp, g)
    }
  }

  test("pairwise match counts match the reference; estimate tracks true Jaccard") {
    // overlapping sets: g0 ∩ g1 = 200 of 600/500; g2 disjoint
    val g0 = (0 until 600).map(i => ("A", s"x$i"))
    val g1 = (400 until 900).map(i => ("B", s"x$i"))
    val g2 = (0 until 300).map(i => ("C", s"z$i"))
    val k = 128
    val df = (g0 ++ g1 ++ g2).toDF("g", "v")
    val got = KmvSketch.jaccardMatchCounts(df, "g", "v", k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

    def ref(a: Seq[String], b: Seq[String]): (Long, Long) = {
      val sa = a.map(h).distinct.sorted.take(k).toSet
      val sb = b.map(h).distinct.sorted.take(k).toSet
      val union = (sa ++ sb).toSeq.sorted.take(k)
      (union.size.toLong, union.count(x => sa(x) && sb(x)).toLong)
    }
    assert(got(("A", "B")) == ref(g0.map(_._2), g1.map(_._2)))
    assert(got(("A", "C")) == ref(g0.map(_._2), g2.map(_._2)))
    assert(got(("B", "C"))._2 == 0L)

    // true J(A,B) = 200/900 ≈ 0.222; the k=128 estimate should be close
    val (uk, m) = got(("A", "B"))
    val est = m.toDouble / uk
    assert(math.abs(est - 200.0 / 900.0) < 0.12, s"estimate $est")
  }

  test("bottom-k ranks push partially below the exchange (WindowGroupLimit)") {
    val df = spark.range(5000)
      .select((col("id") % 7).cast("string").as("g"),
        concat(lit("v"), col("id")).as("v"))
    val plan = KmvSketch.bottomK(df, "g", "v", 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("distinctEstimate is EXACT for under-full sketches") {
    val df = (0 until 500).map(i => ("g" + i % 4, s"v${i % 40}"))
      .toDF("g", "v")
    KmvSketch.distinctEstimate(df, "g", "v", 64).collect().foreach { r =>
      assert(r.getAs[Long]("est_distinct") == r.getAs[Long]("sketch_size"))
      assert(r.getAs[Long]("sketch_size") <= 40L)
    }
  }

  test("distinctEstimate lands in the KMV error envelope when over-full") {
    // 20000 distinct values, k=128: rsd = 1/sqrt(k-2) ≈ 8.9%; a ±40%
    // band is > 4 sigma — deterministic-hash flake-free
    val df = (0 until 20000).map(i => ("g", s"val$i")).toDF("g", "v")
    val est = KmvSketch.distinctEstimate(df, "g", "v", 128)
      .collect().head.getAs[Long]("est_distinct")
    assert(est > 12000 && est < 28000, s"est $est")
  }

  test("intersectionEstimate tracks the true overlap; disjoint pairs estimate 0") {
    val g0 = (0 until 3000).map(i => ("A", s"x$i"))
    val g1 = (2000 until 5000).map(i => ("B", s"x$i"))
    val g2 = (0 until 1000).map(i => ("C", s"z$i"))
    val got = KmvSketch.intersectionEstimate(
      (g0 ++ g1 ++ g2).toDF("g", "v"), "g", "v", 128)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("A", "B"))
    // truth: |A∪B| = 5000, |A∩B| = 1000
    assert(math.abs(ab.getAs[Long]("est_union") - 5000L) < 2000,
      ab.toString)
    assert(math.abs(ab.getAs[Long]("est_inter") - 1000L) < 600,
      ab.toString)
    assert(got(("B", "C")).getAs[Long]("est_inter") == 0L)
    assert(got(("A", "C")).getAs[Long]("est_inter") == 0L)
  }
}
