package graft.streaming

import graft.SparkSpec
import graft.streaming.SeenGate._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState port parity: same gate semantics as the FMGWS form
  * (and therefore as the batch left-semi + bypass). */
class SeenGateTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("transformWithState gate matches the FMGWS gate") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = Seq(
        Event("a", 0, "a1", 1000L), Event("a", 1, "", 1500L),
        Event("a", 0, "a2", 2000L),
        Event("b", 0, "b1", 1000L), // no right → drops
        Event("c", 0, "c1", 1000L, immediate = true))
      val mem = MemoryStream[Event]
      val q = SeenGateTws.gateStream(mem.toDS(), "1 second")
        .writeStream.format("memory").queryName("seen_gate_tws")
        .outputMode("append").start()
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(Event("zz", 1, "", 600000L)) // advance watermark
      q.processAllAvailable()
      q.stop()
      val got = spark.table("seen_gate_tws").select("id")
        .as[String].collect().toSet
      // same answer the FMGWS/batch forms give (SeenGateSpec)
      assert(got == Set("a1", "a2", "c1"))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
