package graft.streaming

import graft.SparkSpec
import graft.schema.ScopedEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Two inferred-join stages in ONE streaming query (transformWithState
  * chaining) must emit exactly what the batch composition q35 gates emits
  * (joinScopedBatch → enrich → joinScopedBatch). */
class FlatChainTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private val W = 10000L
  private val OOO = 1000L

  // stage 1: views (side 0) × insertions (side 1), logUserId scope,
  // right-outer — the q35 stage-1 shape
  private val stage1Events = Seq(
    ScopedEvent(0, "u1", 0, "v1", "", 1000L, Seq("u1")),
    ScopedEvent(0, "u1", 1, "i1", "", 2000L, Seq("u1")),
    ScopedEvent(0, "u2", 1, "i2", "", 2000L, Seq("u2")), // no view → outer
    ScopedEvent(0, "u3", 0, "v3", "", 1500L, Seq("u3")),
    ScopedEvent(0, "u3", 1, "i3", "", 1400L, Seq("u3"))) // slight OOO

  // static enrichment: iid → (request id, content, insertion ts)
  private def insStatic = Seq(
    ("i1", "R1", "C1", 2000L), ("i2", "R2", "C2", 2000L),
    ("i3", "R3", "C3", 1400L)).toDF("iid", "rid", "content", "its")

  // stage 2 RHS: impressions — exact FK, scope-inferred (rid scope with a
  // matching content id), content-MISmatch (must not match), and no-scope
  private val stage2Rhs = Seq(
    ScopedEvent(0, "u1", 1, "m1", "i1", 3000L, Seq("", "")),
    ScopedEvent(0, "u1", 1, "m2", "", 4000L, Seq("R1", ""), Seq("C1")),
    ScopedEvent(0, "u2", 1, "m3", "", 4000L, Seq("R2", ""), Seq("CX")),
    ScopedEvent(0, "u3", 1, "m4", "", 2500L, Seq("", "v3")))

  /** Upstream pairs (+ emittedAt) → stage-2 LHS rows, the q35 enrichment
    * shape: scopes = (request id, view id, content), content ids carried
    * for the ContentId filter. Shared verbatim by batch and streaming. */
  private def toStage2Left(pairs: DataFrame): DataFrame =
    pairs.join(insStatic.withColumnRenamed("iid", "rightId"), "rightId")
      .select(col("platformId"), col("logUserId"), lit(0).as("side"),
        col("rightId").as("id"), lit("").as("parentId"), col("its").as("tsMs"),
        array(col("rid"), col("leftId"), col("content")).as("scopes"),
        array(col("content")).as("contentIds"), col("emittedAt"))

  private def batchResult = {
    val p1 = InferredJoin.joinScopedBatch(
      stage1Events.toDS(), W, OOO, rightOuter = true)
    val left = toStage2Left(p1.toDF()
        .withColumn("emittedAt", timestamp_millis(col("rightTs"))))
      .drop("emittedAt").as[ScopedEvent]
    InferredJoin.joinScopedBatch(
      left.union(stage2Rhs.toDS()), W, OOO, rightOuter = false)
      .toDF().select("logUserId", "leftId", "rightId", "leftTs", "rightTs",
        "matchType")
      .as[(String, String, String, Long, Long, String)].collect().toSet
  }

  test("two chained tws inferred-join stages match the batch composition") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem1 = MemoryStream[ScopedEvent]
      val mem2 = MemoryStream[ScopedEvent]
      val stage1 = InferredJoinTws.joinScopedStream(
        mem1.toDS(), "1 second", W, OOO, rightOuter = true)
      val out = FlatChainTws.nextStage(stage1, toStage2Left,
        mem2.toDS(), "1 second", W, OOO, rightOuter = false)
      val q = out.writeStream.format("memory").queryName("flat_chain_tws")
        .outputMode("append").start()
      mem1.addData(stage1Events: _*)
      mem2.addData(stage2Rhs: _*)
      q.processAllAvailable()
      // advance BOTH source watermarks past every timer, twice: the first
      // sentinel round moves stage 1 (whose releases then move the chained
      // watermark), the second lets stage-2 timers fire on the moved value
      for (ts <- Seq(600000L, 1200000L)) {
        mem1.addData(ScopedEvent(0, "zz", 1, s"z$ts", "", ts, Seq("zz")))
        mem2.addData(ScopedEvent(0, "zz", 1, s"y$ts", "", ts, Seq("zz")))
        q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("flat_chain_tws")
        .where(col("logUserId") =!= "zz")
        .select("logUserId", "leftId", "rightId", "leftTs", "rightTs",
          "matchType")
        .as[(String, String, String, Long, Long, String)].collect().toSet
      assert(got == batchResult)
      // and the interesting cases really are in there
      val byRight = got.map(t => t._3 -> t._6).toMap
      assert(byRight("m1") == "exact")
      assert(byRight("m2") == "inferred")
      assert(byRight("m4") == "inferred")
      assert(byRight("m3") == "dropped") // content mismatch on the rid scope
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
