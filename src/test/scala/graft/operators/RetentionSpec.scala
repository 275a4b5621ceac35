package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  test("cells match a sequential reference on the real events table") {
    val day = 86400000L
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
    val rows = ev.select("user_id", "ts_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1) - r.getLong(1) % day))
    val firstSeen = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = rows.distinct
      .groupBy { case (u, b) => (firstSeen(u), (b - firstSeen(u)) / day) }
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val got = Retention.cohortRetention(ev, "user_id", "ts_ms", day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == exp)
    // offset-0 cells exist for every cohort and dominate later offsets
    got.keys.map(_._1).foreach(c => assert(got.contains((c, 0L)), s"cohort $c"))
  }

  test("single-bucket users land only in offset 0") {
    val day = 100L
    val df = Seq((1L, 10L), (1L, 50L), (2L, 110L), (2L, 130L), (3L, 10L), (3L, 250L))
      .toDF("u", "ts")
    val got = Retention.cohortRetention(df, "u", "ts", day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (100L, 0L) -> 1L, (0L, 2L) -> 1L))
  }

  test("cohortLtv: cells and running totals by hand") {
    import org.apache.spark.sql.functions.col
    val day = 100L
    // u1 cohort 0: 10¢@d0, 20¢@d0, 30¢@d2; u2 cohort 100: 40¢@d0 (ts 150)
    val df = Seq(("u1", 10L, 10L), ("u1", 50L, 20L), ("u1", 250L, 30L),
      ("u2", 150L, 40L)).toDF("u", "ts", "cents")
    val got = Retention.cohortLtv(df, "u", "ts", col("cents"), day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((0L, 0L)) == ((2L, 30L, 30L)))
    assert(got((0L, 2L)) == ((1L, 30L, 60L)))   // cumulative skips empty d1
    assert(got((100L, 0L)) == ((1L, 40L, 40L)))
    assert(got.size == 3)
  }

  test("audienceChurn: exact day-over-day Jaccard, repeats deduped") {
    val day = 100L
    // d0: {u1,u2}; d1: {u2,u3,u3-dup}; d2: {u4}
    val df = Seq(("u1", 10L), ("u2", 20L), ("u2", 110L), ("u3", 120L),
      ("u3", 130L), ("u4", 250L)).toDF("u", "ts")
    val got = Retention.audienceChurn(df, "u", "ts", day)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // d1 vs d0: inter {u2} = 1, union 3 -> 333333
    assert(got(100L) == ((2L, 2L, 1L, 333333L)))
    // d2 vs d1: disjoint -> 0
    assert(got(200L) == ((1L, 2L, 0L, 0L)))
    assert(got.size == 2)   // d0 has no predecessor
  }
}
