package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L)
    .map(i => (i, s"doc $i " + ("x " * (i % 7).toInt)))
    .toDF("doc_id", "text")

  test("manifest matches a recount and the layout is one dir per shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString + "/s"
    val manifest = ShardExport.write(docs, dir, 8,
      shardKey = col("doc_id"), orderBy = col("doc_id"),
      tokens = size(split(trim(col("text")), "\\s+")),
      bytes = octet_length(col("text")))
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = docs
      .groupBy((col("doc_id") % 8).as("shard"))
      .agg(count(lit(1)), sum(size(split(trim(col("text")), "\\s+"))),
        sum(octet_length(col("text"))))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(manifest == expected)
    val shardDirs = new java.io.File(dir).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shardDirs == (0 until 8).map(i => s"shard=$i").toSet)
  }

  test("readShard scans only its directory and assignment is deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString + "/s"
    ShardExport.write(docs, dir, 8, col("doc_id"), col("doc_id"),
      lit(1L), octet_length(col("text")))
    val s3 = ShardExport.readShard(spark, dir, 3)
    assert(s3.select("doc_id").as[Long].collect().toSet ==
      (0L until 200L).filter(_ % 8 == 3).toSet)
    // Directory pruning: the physical scan reads only shard=3 files.
    val scanned = s3.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray.map(_.urlEncodedPath).toSeq
      }.get
    assert(scanned.nonEmpty && scanned.forall(_.contains("shard=3")))
    // Re-export lands every doc in the same shard (stable backfills).
    ShardExport.write(docs, dir, 8, col("doc_id"), col("doc_id"),
      lit(1L), octet_length(col("text")))
    assert(ShardExport.readShard(spark, dir, 3)
      .select("doc_id").as[Long].collect().toSet ==
      (0L until 200L).filter(_ % 8 == 3).toSet)
  }
}
