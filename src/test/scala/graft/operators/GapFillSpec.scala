package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("gaps densify within each key's span and carry the last value forward") {
    val df = Seq(
      ("a", 105L, 1.0), ("a", 130L, 9.0), ("a", 310L, 3.0), // bucket 100,300 (130 loses to 9? same bucket max)
      ("b", 1000L, 5.0))
      .toDF("k", "ts", "v")
    val got = GapFill.forwardFill(df, "k", "ts", "v", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("a", 100L) -> ((9.0, true)),  // max of 1.0, 9.0 in the bucket
      ("a", 200L) -> ((9.0, false)), // filled from bucket 100
      ("a", 300L) -> ((3.0, true)),
      ("b", 1000L) -> ((5.0, true))))
  }

  test("matches a sequential reference on the real events table") {
    val hour = 3600000L
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
      .where(col("user_id") < 20)
    val rows = ev.select("user_id", "ts_ms", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1) - r.getLong(1) % hour, r.getDouble(2)))
    val byKeyBucket = rows.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).max)
    val exp = byKeyBucket.keys.groupBy(_._1).flatMap { case (k, cells) =>
      val buckets = cells.map(_._2)
      var lastV = Double.NaN
      (buckets.min to buckets.max by hour).map { b =>
        val obs = byKeyBucket.get((k, b))
        obs.foreach(v => lastV = v)
        (k, b) -> ((lastV, obs.isDefined))
      }
    }.toMap
    val got = GapFill.forwardFill(ev, "user_id", "ts_ms", "value", hour)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got == exp)
    // the fixture genuinely has gaps
    assert(got.values.exists(!_._2))
  }

  test("runaway spans fail loudly instead of exploding") {
    val df = Seq(("k", 0L, 1.0), ("k", 10000000L, 2.0)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      GapFill.forwardFill(df, "k", "ts", "v", 1L, maxBucketsPerKey = 1000L)
        .count()
    }
    assert(e.getMessage != null)
  }

  test("linearFill interpolates gaps exactly, truncating toward zero") {
    // observations at buckets 0,3,7: 0→90 rises 30/bucket; 90→20 falls
    // 17.5/bucket — the falls exercise negative-numerator truncation
    val df = Seq(("k", 0L, 0L), ("k", 30L, 90L), ("k", 70L, 20L))
      .toDF("k", "ts", "v")
    val got = GapFill.linearFill(df, "k", "ts", "v", 10L)
      .collect().map(r => r.getLong(1) / 10 ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      0L -> ((0L, true)), 1L -> ((30L, false)), 2L -> ((60L, false)),
      3L -> ((90L, true)),
      // 90 + (20-90)*k/4 for k=1..3: 90-17.5k → trunc: 73, 55, 38
      4L -> ((73L, false)), 5L -> ((55L, false)), 6L -> ((38L, false)),
      7L -> ((20L, true))))
  }

  test("linearFill equals forwardFill on observed rows and differs only in gaps") {
    val df = Seq(("a", 0L, 5L), ("a", 20L, 11L), ("b", 0L, 7L))
      .toDF("k", "ts", "v")
    val lin = GapFill.linearFill(df, "k", "ts", "v", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(lin(("a", 0L)) == ((5L, true)))
    assert(lin(("a", 10L)) == ((8L, false))) // (5+11)/2
    assert(lin(("a", 20L)) == ((11L, true)))
    assert(lin(("b", 0L)) == ((7L, true)))
  }
}
