package graft.streaming

import graft.SparkSpec
import graft.schema.DeliveryLogLite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CombineDeliveryLogSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private def log(crid: String, rid: String, server: String, ts: Long) =
    DeliveryLogLite(1L, "u", crid, rid, server, ts)

  test("batch: API wins over SDK within the same clientRequestId") {
    val out = CombineDeliveryLog.combineBatch(Seq(
      log("c1", "rSdk", "SDK", 1000L), log("c1", "rApi", "API", 1500L),
      log("c2", "rOnly", "SDK", 2000L)).toDS())
      .collect().map(d => d.clientRequestId -> d.requestId).toMap
    assert(out == Map("c1" -> "rApi", "c2" -> "rOnly"))
  }

  test("streaming: merge within 2s window, emit after watermark passes") {
    val mem = MemoryStream[DeliveryLogLite]
    val q = CombineDeliveryLog.combineStream(mem.toDS(), "1 second", 2000L)
      .writeStream.format("memory").queryName("cdl_out")
      .outputMode("append").start()

    mem.addData(log("c1", "rSdk", "SDK", 1000L), log("c1", "rApi", "API", 2500L))
    q.processAllAvailable()
    mem.addData(log("cx", "r9", "SDK", 60000L)) // advance watermark
    q.processAllAvailable()
    mem.addData(log("cy", "r10", "SDK", 120000L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("cdl_out").as[DeliveryLogLite].collect()
      .map(d => d.clientRequestId -> d.requestId).toMap
    assert(out.get("c1") == Some("rApi"))
  }
}
