package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  private def data: DataFrame =
    Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(30L)))
      .toDF("id", "v")

  private def summary(dir: String): (Long, Long, Long) = {
    val r = spark.read.json(s"$dir/summary.json").collect().head
    (r.getAs[Long]("rows"), r.getAs[Long]("tasks"),
      r.getAs[org.apache.spark.sql.Row]("sums").getAs[Long]("v"))
  }

  test("committed summary carries exact counts and null-skipping sums") {
    val dir = java.nio.file.Files.createTempDirectory("audit1").toString
    data.repartition(3).write.format("graft-audit")
      .option("path", dir).option("sumCols", "v").mode("append").save()
    val (rows, tasks, v) = summary(dir)
    assert(rows == 4L && v == 60L) // NULL counts toward rows, not sums
    assert(tasks >= 1L)
  }

  test("partition count never changes the committed totals") {
    val a = java.nio.file.Files.createTempDirectory("audit2a").toString
    val b = java.nio.file.Files.createTempDirectory("audit2b").toString
    val big = spark.range(10000).select(col("id"), (col("id") % 97).as("v"))
    big.repartition(1).write.format("graft-audit")
      .option("path", a).option("sumCols", "v").mode("append").save()
    big.repartition(13).write.format("graft-audit")
      .option("path", b).option("sumCols", "v").mode("append").save()
    val (ra, _, va) = summary(a)
    val (rb, _, vb) = summary(b)
    assert(ra == rb && va == vb && ra == 10000L)
    val want = big.agg(sum(col("v"))).head().getLong(0)
    assert(va == want)
  }

  test("non-long sum columns are rejected loudly") {
    val dir = java.nio.file.Files.createTempDirectory("audit3").toString
    val err = intercept[Exception] {
      Seq(("x", 1.5)).toDF("s", "d").write.format("graft-audit")
        .option("path", dir).option("sumCols", "d").mode("append").save()
    }
    assert(err.getMessage.contains("LongType") ||
      Option(err.getCause).exists(_.getMessage.contains("LongType")))
  }

  test("streaming epochs each publish a summary; totals add up") {
    val dir = java.nio.file.Files.createTempDirectory("audit5").toString
    val ckpt = java.nio.file.Files.createTempDirectory("audit5ck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)](spark)
    val q = mem.toDS().toDF("id", "v")
      .writeStream.format("graft-audit")
      .option("path", dir).option("sumCols", "v")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      mem.addData((3L, 30L))
      q.processAllAvailable()
    } finally q.stop()
    val eps = spark.read.json(s"$dir/summary_epoch_*.json")
    val tot = eps.agg(sum(col("rows")), sum(col("sums.v"))).collect().head
    assert(tot.getLong(0) == 3L && tot.getLong(1) == 60L)
    assert(eps.count() >= 2L) // one summary per non-trivial epoch
  }

  test("overwrite mode is accepted (truncate is a no-op on a pure audit)") {
    val dir = java.nio.file.Files.createTempDirectory("audit4").toString
    data.write.format("graft-audit").option("path", dir)
      .option("sumCols", "v").mode("overwrite").save()
    assert(summary(dir)._1 == 4L)
  }
}
