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

  private def refEwma(vs: Seq[Double], alpha: Double): Double =
    vs.tail.foldLeft(vs.head)((acc, x) => alpha * x + (1.0 - alpha) * acc)

  test("EWMA matches the sequential fold; spike on the last point flags") {
    val steady = (0L until 20L).map(i => ("s", i, 10.0 + (i % 3).toDouble))
    val spiky = (0L until 19L).map(i => ("x", i, 10.0)) :+ (("x", 19L, 90.0))
    val single = Seq(("one", 0L, 7.0))
    val df = (steady ++ spiky ++ single).toDF("k", "ts", "v")
    val got = Anomaly.ewmaResiduals(df, "k", "ts", "v", alpha = 0.2, band = 20.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))).toMap
    val sVs = steady.map(_._3)
    assert(got("s")._2 == refEwma(sVs, 0.2))
    assert(got("s")._4.get == sVs.last - refEwma(sVs.init, 0.2))
    assert(!got("s")._5, "steady series must not flag")
    assert(got("x")._5, "80-point jump against a flat forecast must flag")
    assert(got("one") == ((1L, 7.0, 7.0, None, false)), "n=1: no residual")
  }

  test("EWMA is partition-invariant (pinned fold order)") {
    val df = (0L until 300L)
      .map(i => (i % 7L, i, (i * 37 % 101).toDouble)).toDF("k", "ts", "v")
    def run(parts: Int) = Anomaly
      .ewmaResiduals(df.repartition(parts), "k", "ts", "v", 0.3, 10.0)
      .orderBy("k").collect().toSeq
    assert(run(1) == run(13))
  }

  /** Sequential reference for the CUSUM recurrence S_i = max(0, S_{i−1} +
    * v_i − μ − κ), alarms counted where S crosses the threshold. */
  private def refCusum(vs: Seq[(Long, Long)], slack: Long, thr: Long)
      : (Long, Long, Long) = {
    val mu = vs.map(_._2).sum / vs.size
    var s = 0L; var maxS = 0L; var alarms = 0L; var firstTs = -1L
    vs.foreach { case (ts, v) =>
      s = math.max(0L, s + v - mu - slack)
      maxS = math.max(maxS, s)
      if (s > thr) { alarms += 1; if (firstTs < 0) firstTs = ts }
    }
    (maxS, alarms, firstTs)
  }

  test("CUSUM window form matches the sequential recurrence; drift alarms, noise doesn't") {
    // flat-then-shifted key drifts up and must alarm; a noisy-but-centered
    // key must not; a strictly-below-baseline tail resets S to zero.
    val drift = (0L until 30L).map(i =>
      ("drift", i, if (i < 15) 10.0 else 25.0))
    val noise = (0L until 30L).map(i => ("noise", i, 10.0 + (i % 3).toDouble))
    val df = (drift ++ noise).toDF("k", "ts", "v")
    val got = Anomaly.cusumDrift(df, "k", "ts", "v",
        slackE6 = 1000000L, thresholdE6 = 50000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    Seq("drift" -> drift, "noise" -> noise).foreach { case (k, rows) =>
      val vs = rows.map(t => (t._2, math.round(t._3 * 1000000.0)))
      val (maxS, alarms, firstTs) = refCusum(vs, 1000000L, 50000000L)
      assert(got(k) == ((rows.size.toLong, maxS, alarms, firstTs)), k)
    }
    assert(got("drift")._3 > 0, "upward shift must alarm")
    assert(got("noise")._3 == 0L, "centered noise must not alarm")
  }

  test("CUSUM is partition-invariant (exact integers, window form)") {
    val df = (0L until 400L)
      .map(i => (i % 5L, i, (i * 53 % 97).toDouble)).toDF("k", "ts", "v")
    def run(parts: Int) = Anomaly
      .cusumDrift(df.repartition(parts), "k", "ts", "v", 0L, 1000000000L)
      .orderBy("k").collect().toSeq
    assert(run(1) == run(17))
  }

  test("seasonalResiduals picks latest baseline in the lag window, ties to largest id") {
    val day = 86400000L
    val rows = Seq(
      // key A: two candidate baselines in [t-day-2h, t-day]; latest wins
      ("A", 1L, 0L, 100L),
      ("A", 2L, 3600000L, 110L),            // latest in window for t=day+1h+...
      ("A", 3L, day + 3600000L, 130L),      // frame [1h-2h...1h] wait: [t-day-2h, t-day] = [-3600000, 3600000] -> rows 1,2 -> latest ts=3600000 -> 110
      // key A tie: two events at the same baseline ts; larger id wins
      ("A", 4L, 3600000L, 115L),            // same ts as id 2
      // key B: baseline exactly at t-day (inclusive upper edge)
      ("B", 5L, 0L, 50L),
      ("B", 6L, day, 57L),
      // key B: nothing within [t-day-2h, t-day] -> null baseline
      ("B", 7L, 3L * day, 99L)
    ).toDF("k", "id", "ts", "v").repartition(5)
    val got = Anomaly.seasonalResiduals(rows, "k", "id", "ts", "v",
        periodMs = day, toleranceMs = 7200000L)
      .collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(4)) None
        else Some((r.getLong(4), r.getLong(5), r.getLong(6))))).toMap
    // id 3: frame over A = ts in [3600000+... ] -> rows {1,2,4}: ts range
    // [t-day-2h, t-day] = [-3600000, 3600000]; latest ts 3600000, ids
    // {2,4} tie -> id 4 -> baseline 115, residual 130-115=15
    assert(got(3L) == Some((3600000L, 115L, 15L)))
    // id 6: frame [day-day-2h, 0] includes ts=0 -> baseline 50, residual 7
    assert(got(6L) == Some((0L, 50L, 7L)))
    // id 7: nearest candidate (day) is older than t-day-2h -> no baseline
    assert(got(7L) == None)
    // warm-up rows with empty frames are emitted with null baselines
    assert(got(1L) == None && got(2L) == None)
  }
}
