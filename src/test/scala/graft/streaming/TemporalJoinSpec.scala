package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  test("streaming as-of: facts pick the latest dim version <= ts") {
    val facts = MemoryStream[TemporalJoin.Fact]
    val dims = MemoryStream[TemporalJoin.DimVersion]
    val q = TemporalJoin.joinStream(facts.toDS(), dims.toDS(), "1 second")
      .writeStream.format("memory").queryName("tj_out")
      .outputMode("append").start()

    dims.addData(
      TemporalJoin.DimVersion("u1", "v1", 1000L),
      TemporalJoin.DimVersion("u1", "v2", 5000L))
    facts.addData(
      TemporalJoin.Fact("u1", "f1", 2000L), // → v1
      TemporalJoin.Fact("u1", "f2", 6000L), // → v2
      TemporalJoin.Fact("u2", "f3", 2000L)) // → no dim
    q.processAllAvailable()
    // push the watermark past all fact timestamps
    facts.addData(TemporalJoin.Fact("uX", "wm", 60000L))
    q.processAllAvailable()
    facts.addData(TemporalJoin.Fact("uY", "wm2", 120000L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tj_out").as[TemporalJoin.Out].collect()
      .map(o => o.factId -> Option(o.value)).toMap
    assert(out("f1") == Some("v1"))
    assert(out("f2") == Some("v2"))
    assert(out("f3") == None)
  }

  test("pure transition prunes versions below the watermark") {
    val st = TemporalJoin.State(List((1000L, "a"), (5000L, "b"), (9000L, "c")), Nil)
    val (_, next) = TemporalJoin.advance("k", Nil, st, 6000L)
    // keep the as-of-watermark version (5000,b) and everything newer
    assert(next.versions == List((5000L, "b"), (9000L, "c")))
  }
}
