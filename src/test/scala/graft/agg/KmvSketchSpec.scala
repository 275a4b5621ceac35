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
}
