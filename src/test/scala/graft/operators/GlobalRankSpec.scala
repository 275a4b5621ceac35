package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalRowNumber matches a window row_number, any partitioning") {
    val df = Seq((5L, "e"), (3L, "c"), (9L, "a"), (3L, "a"), (1L, "z"))
      .toDF("v", "t")
    // v desc, tie on v=3 broken by t asc
    val want = Map(("a", 9L) -> 1L, ("e", 5L) -> 2L, ("a", 3L) -> 3L,
      ("c", 3L) -> 4L, ("z", 1L) -> 5L)
    for (p <- Seq(1, 2, 3, 8)) {
      val got = GlobalRank.withGlobalRowNumber(df,
          Seq(col("v").desc, col("t").asc), "rn", partitions = p)
        .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2))
        .toMap
      assert(got == want, s"partitions=$p")
    }
  }

  test("withGlobalRowNumberAndTotal returns the exact row count for free") {
    val df = spark.range(137).select(col("id").as("v"))
    val (out, n) = GlobalRank.withGlobalRowNumberAndTotal(df,
      Seq(col("v").asc), "rn", partitions = 5)
    assert(n == 137L)
    assert(out.count() == 137L)
    val (_, zero) = GlobalRank.withGlobalRowNumberAndTotal(
      df.where(col("v") < 0), Seq(col("v").asc), "rn")
    assert(zero == 0L)
  }

  test("withGlobalRowNumber is dense from 1 on a larger shuffled input") {
    val df = spark.range(1000).select(
      (col("id") * 7919 % 1000).as("v"), col("id").as("k"))
    val rns = GlobalRank.withGlobalRowNumber(df,
        Seq(col("v").asc, col("k").asc), "rn", partitions = 7)
      .select("rn").as[Long].collect().sorted
    assert(rns.toSeq == (1L to 1000L))
  }
}
