package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixSchemaSpec extends SparkSpec {
  import spark.implicits._

  test("date-filtered rewrite applies add/rename/cast") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fix").toString
    Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"), ("2024-01-09", 3L, "c"))
      .toDF("dt", "id", "payload")
      .write.partitionBy("dt").parquet(s"$tmp/in")

    FixSchemaJob.run(spark, s"$tmp/in", s"$tmp/out",
      Seq(
        FixSchemaJob.AddColumn("version", lit(2)),
        FixSchemaJob.RenameColumn("payload", "body"),
        FixSchemaJob.CastColumn("id", "string")),
      dtFrom = "2024-01-01", dtTo = "2024-01-02")

    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 2) // 01-09 outside the range
    assert(out.columns.toSet == Set("dt", "id", "body", "version"))
    assert(out.schema("id").dataType.typeName == "string")
    assert(out.select("version").distinct().head().getInt(0) == 2)
  }
}
