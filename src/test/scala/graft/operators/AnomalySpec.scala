package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def refLowerMedian(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.size + 1) / 2 - 1)

  test("flags match a sequential MAD reference on the real events table") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts"))).where(col("user_id") < 30)
    val rows = ev.select("user_id", "ts_ms", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = rows.groupBy(_._1).toSeq.flatMap { case (k, es) =>
      val med = refLowerMedian(es.map(_._3).toSeq)
      val devs = es.map(t => math.abs(t._3 - med))
      val mad = refLowerMedian(devs.toSeq)
      es.zip(devs).map { case ((_, ts, v), d) =>
        (k, ts, v) -> ((d, d * 1.0 > mad * 3.0))
      }
    }.toMap
    val got = Anomaly.madOutliers(ev, "user_id", "ts_ms", "value", 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got == exp)
    // both verdicts occur on real data
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("constant series: MAD 0, nothing flagged; single spike flags only itself") {
    val df = (Seq.fill(9)(("k", 5.0)) :+ (("k", 100.0))).zipWithIndex
      .map { case ((k, v), i) => (k, i.toLong, v) }.toDF("k", "ts", "v")
    val got = Anomaly.madOutliers(df, "k", "ts", "v", 3L)
      .collect().map(r => r.getDouble(2) -> r.getBoolean(4)).toMap
    assert(got(5.0) == false)
    assert(got(100.0) == true) // dev 95 > 3 × MAD 0
  }
}
