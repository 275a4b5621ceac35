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

  test("randomized: FMGWS advance agrees with the relational AsOfJoin") {
    import graft.operators.AsOfJoin
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31337L)
    for (trial <- 1 to 30) {
      val nDim = 1 + rnd.nextInt(8); val nFact = 1 + rnd.nextInt(8)
      // distinct version timestamps: at equal ts the two implementations
      // break ties differently (arrival order vs tie column) by design
      val dimTs = rnd.shuffle((1 to 50).toList).take(nDim)
      val dims = dimTs.zipWithIndex.map { case (t, i) =>
        (t * 100L, s"v$i") }
      val facts = (1 to nFact).map(i => (s"f$i", rnd.nextInt(5200).toLong))

      // model: TemporalJoin.advance in one batch, everything resolvable
      val events = dims.map { case (t, v) =>
        TemporalJoin.In("k", isDim = true, "", v, t) } ++
        facts.map { case (id, t) => TemporalJoin.In("k", isDim = false, id, null, t) }
      val model = TemporalJoin.advance("k", events, TemporalJoin.State(Nil, Nil),
        Long.MaxValue)._1.map(o => o.factId -> Option(o.value)).toMap

      // relational: AsOfJoin over the same data
      val fdf = facts.toDF("fact_id", "ts_ms").withColumn("key", lit("k"))
      val ddf = dims.toDF("dim_ts", "value").withColumn("key", lit("k"))
        .select(col("key"), col("value"), col("dim_ts"))
      val rel = AsOfJoin.leftAsOf(fdf, ddf, Seq("key"), "ts_ms", "dim_ts",
          Seq("value"), "dim_ts")
        .select(col("fact_id"), col("value"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(model == rel, s"trial $trial dims=$dims facts=$facts")
    }
  }

  test("pure transition prunes versions below the watermark") {
    val st = TemporalJoin.State(List((1000L, "a"), (5000L, "b"), (9000L, "c")), Nil)
    val (_, next) = TemporalJoin.advance("k", Nil, st, 6000L)
    // keep the as-of-watermark version (5000,b) and everything newer
    assert(next.versions == List((5000L, "b"), (9000L, "c")))
  }

  test("re-delivered equal-ts version dedupes across the whole same-ts run") {
    import TemporalJoin._
    // v1 then v2 at the same ts: later arrival (v2) sorts last and wins
    val (_, st1) = advance("k", Seq(In("k", true, "", "v1", 100L),
      In("k", true, "", "v2", 100L)), State(Nil, Nil), Long.MinValue)
    assert(st1.versions == List((100L, "v1"), (100L, "v2")))
    // at-least-once source re-delivers v1; v2 sits between the duplicate
    // and the insert point — re-inserting v1 after v2 would flip the
    // as-of winner back to v1
    val (_, st2) = advance("k", Seq(In("k", true, "", "v1", 100L)), st1,
      Long.MinValue)
    assert(st2.versions == List((100L, "v1"), (100L, "v2")))
    val (out, _) = advance("k", Seq(In("k", false, "f1", null, 150L)), st2,
      Long.MaxValue)
    assert(out == Seq(Out("k", "f1", 150L, "v2", 100L)))
  }
}
