package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  test("runningMax equals the window form for every partition count") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 2L), (5L, 9L),
      (6L, 11L), (7L, 1L)).toDF("k", "v")
    val want = df.withColumn("hwm",
        max(col("v")).over(Window.orderBy(col("k"))))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (p <- Seq(1, 2, 3, 7)) {
      val got = PrefixScan.runningMax(df, Seq(col("k")), col("v"), "hwm",
          partitions = p)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("hwm")).toMap
      assert(got == want, s"partitions=$p")
    }
  }

  test("runningSum equals the window cumsum for every partition count") {
    val df = Seq((1L, 1L), (2L, -1L), (3L, 2L), (4L, -2L), (5L, 5L),
      (6L, -3L)).toDF("k", "v")
    val want = Map(1L -> 1L, 2L -> 0L, 3L -> 2L, 4L -> 0L, 5L -> 5L,
      6L -> 2L)
    for (p <- Seq(1, 2, 3, 6)) {
      val got = PrefixScan.runningSum(df, Seq(col("k")), col("v"), "s",
          partitions = p)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("s")).toMap
      assert(got == want, s"partitions=$p")
    }
  }

  test("runningMax on a larger shuffled input is a monotone envelope") {
    val df = spark.range(2000).select(col("id").as("k"),
      (col("id") * 7919 % 1000).as("v"))
    val rows = PrefixScan.runningMax(df, Seq(col("k")), col("v"), "hwm",
        partitions = 9)
      .orderBy("k").select("v", "hwm").as[(Long, Long)].collect()
    var run = Long.MinValue
    rows.foreach { case (v, h) =>
      run = math.max(run, v); assert(h == run)
    }
  }
}
