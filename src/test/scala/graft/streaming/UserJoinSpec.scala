package graft.streaming

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class UserJoinSpec extends SparkSpec {
  import spark.implicits._

  test("partial updates merge latest-non-empty per attribute") {
    val updates = Seq(
      ("u1", 1000L, 1L, "alice", ""),
      ("u1", 2000L, 2L, "", "pro"),   // name carries forward
      ("u1", 3000L, 3L, "alicia", ""))
      .toDF("key", "ts_ms", "seq", "name", "tier")
    val got = UserJoin.mergedUpdates(updates, Seq("key"), "ts_ms", "seq",
        Seq("name", "tier"))
      .orderBy("ts_ms").collect()
      .map(r => (r.getLong(1), r.getString(3), r.getString(4)))
    assert(got.toSeq == Seq((1000L, "alice", null), (2000L, "alice", "pro"),
      (3000L, "alicia", "pro")))
  }

  test("events join the merged snapshot as of their timestamp") {
    val updates = Seq(
      ("u1", 1000L, 1L, "alice", ""), ("u1", 2000L, 2L, "", "pro"))
      .toDF("key", "ts_ms", "seq", "name", "tier")
    val dims = UserJoin.mergedUpdates(updates, Seq("key"), "ts_ms", "seq",
      Seq("name", "tier"))
      .select(col("key"), col("ts_ms").as("dim_ts_ms"), col("seq"),
        col("name"), col("tier"))
    val facts = Seq(("u1", 1500L, 100L), ("u1", 2500L, 101L))
      .toDF("key", "ts_ms", "fact_id")
    val got = AsOfJoin.leftAsOf(facts, dims, Seq("key"), "ts_ms", "dim_ts_ms",
        Seq("name", "tier"), "seq")
      .collect().map(r => r.getAs[Long]("fact_id") ->
        (r.getAs[String]("name"), r.getAs[String]("tier"))).toMap
    assert(got(100L) == ("alice", null)) // as of 1500: only the first update
    assert(got(101L) == ("alice", "pro"))
  }
}
