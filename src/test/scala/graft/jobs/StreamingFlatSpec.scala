package graft.jobs

import graft.SparkSpec
import graft.schema.{JoinSideEvent, JoinedPair}
import graft.sources.{FakeLogGenerator, LogRequestSplit}
import graft.streaming.InferredJoin
import org.apache.spark.sql.functions._

/** End-to-end streaming slice of the join job: parquet file stream →
  * envelope split → inferred join (FMGWS) → memory sink, compared against
  * the identical batch run — the readStream/writeStream counterpart of the
  * reference's streams-as-batch equivalence. */
class StreamingFlatSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("file-stream inferred join matches the batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val opts = FakeLogGenerator.Options(users = 3, viewsPerUser = 2)
    val envelopes = FakeLogGenerator.generate(opts).toDS().toDF()

    // split batch-side to define the tiny join input (same code path the
    // streaming read uses below)
    def sides(env: org.apache.spark.sql.DataFrame) = {
      val ins = LogRequestSplit.deliveryLogs(env).toDF()
        .select(col("platformId"), col("userInfo.logUserId").as("logUserId"),
          col("timing.eventApiTimestamp").as("tsMs"), explode(col("insertions")).as("i"))
        .select(col("platformId"), col("logUserId"), lit(0).as("side"),
          col("i.insertionId").as("id"), lit("").as("parentId"), col("tsMs"))
      val imp = LogRequestSplit.impressions(env).toDF()
        .select(col("platformId"), col("userInfo.logUserId").as("logUserId"),
          lit(1).as("side"), col("impressionId").as("id"),
          col("insertionId").as("parentId"),
          col("timing.eventApiTimestamp").as("tsMs"))
      ins.unionByName(imp)
    }

    val batchInput = sides(envelopes).as[JoinSideEvent]
    val expected = InferredJoin.joinBatch(batchInput, 1800000L, 1000L)
      .collect().map(p => p.rightId -> (p.leftId, p.matchType)).toMap

    // stage the same side events as three time-ordered parquet files plus a
    // watermark-advancing tail, consumed one file per micro-batch
    val staged = batchInput.orderBy("tsMs").collect()
    val tail = staged.map(e => e.copy(tsMs = e.tsMs + 7200000L,
      id = "wm-" + e.id, side = 0, parentId = ""))
    val groups = staged.grouped(math.max(staged.length / 3, 1)).toSeq :+ tail.take(1) :+
      tail.slice(1, 2).map(e => e.copy(tsMs = e.tsMs + 7200000L))
    groups.zipWithIndex.foreach { case (g, i) =>
      g.toSeq.toDS().repartition(1).write.parquet(s"$tmp/in/batch=$i")
    }

    val stream = spark.readStream
      .schema(batchInput.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in/*")
      .as[JoinSideEvent]
    val q = InferredJoin.joinStream(stream, "1 second", 1800000L, 1000L)
      .writeStream.format("memory").queryName("sflat_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sflat_out").as[JoinedPair].collect()
      .filterNot(_.rightId.startsWith("wm-"))
      .map(p => p.rightId -> (p.leftId, p.matchType)).toMap
    assert(got == expected)
  }
}
