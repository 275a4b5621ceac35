package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema._

/** Row shape a test producer writes — must stay structurally identical to
  * the connector's source output (asserted against KafkaSeam.wireSchema). */
case class WireRecord(
    key: Array[Byte], value: Array[Byte], topic: String, partition: Int,
    offset: Long, timestamp: Timestamp, timestampType: Int)

class KafkaSeamSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private def sampleEnvelopes: Seq[LogRequest] = Seq(
    LogRequest(
      platformId = 7L,
      userInfo = UserInfo("u1", "LogUser-A"),
      timing = Timing(1000L, 2000L, 3000L),
      views = Seq(View(viewId = "v1", contentId = "c1"),
        View(viewId = "v2", contentId = "c2",
          userInfo = UserInfo("override", "OverrideLog"))),
      deliveryLogs = Seq(DeliveryLog(
        request = DeliveryRequest(requestId = "r1", viewId = "v1",
          searchQuery = "shoes",
          insertionMatrixHeaders = Seq("contentId", "retrievalRank"),
          insertionMatrix = Seq(Seq("c1", "0"), Seq("c2", "1"))),
        insertions = Seq(ResponseInsertion("i1", "c1", 0L, Map(17L -> 1L))))),
      impressions = Seq(Impression(impressionId = "im1", insertionId = "i1")),
      actions = Seq(Action(actionId = "a1", impressionId = "im1",
        actionType = ActionType.Purchase,
        cart = Seq(CartContent("c1", 2L, 1299L))))),
    LogRequest(platformId = 7L, userInfo = UserInfo("", "loguser-b"),
      timing = Timing(0L, 5000L, 0L),
      views = Seq(View(viewId = "v3"))))

  private def namesAndTypes(s: org.apache.spark.sql.types.StructType) =
    s.fields.map(f => f.name -> f.dataType).toSeq

  test("test wire rows match the connector's published source schema") {
    // names + types (nullability is connector-defined) — if this drifts,
    // the streaming test below is testing a fantasy schema
    assert(namesAndTypes(Encoders.product[WireRecord].schema) ==
      namesAndTypes(KafkaSeam.wireSchema))
  }

  test("encode→decode round-trips nested envelopes bit-exactly (batch)") {
    val env = sampleEnvelopes.toDS().toDF()
    val wire = KafkaSeam.encode(env, col("userInfo.logUserId"))
    assert(wire.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      Seq("key" -> org.apache.spark.sql.types.BinaryType,
        "value" -> org.apache.spark.sql.types.BinaryType))
    val back = KafkaSeam.decode(wire).as[LogRequest].collect()
    assert(back.toSeq == sampleEnvelopes)
  }

  test("decoded stream drives the split stages (wire → views with push-down)") {
    val stream = MemoryStream[WireRecord]
    val wireDf = stream.toDF()
    assert(namesAndTypes(wireDf.schema) == namesAndTypes(KafkaSeam.wireSchema))

    val views = LogRequestSplit.views(KafkaSeam.decode(wireDf)).toDF()
    val q = views.writeStream.format("memory").queryName("kafka_seam_views")
      .outputMode("append").start()
    try {
      val encoded = KafkaSeam.encode(sampleEnvelopes.toDS().toDF(),
        col("userInfo.logUserId")).collect()
      stream.addData(encoded.zipWithIndex.map { case (r, i) =>
        WireRecord(r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"),
          "metrics.log-request", 0, i.toLong, new Timestamp(1700000000000L + i), 0)
      }.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("kafka_seam_views").as[View].collect()
      assert(got.length == 3)
      // envelope push-down applied on the wire-decoded path, including the
      // reference's logUserId lower-casing; v2's own userInfo wins
      val byId = got.map(v => v.viewId -> v).toMap
      assert(byId("v1").userInfo.logUserId == "loguser-a")
      assert(byId("v2").userInfo.logUserId == "overridelog")
      assert(byId("v1").platformId == 7L)
    } finally q.stop()
  }

  test("unparseable value decodes to an all-null row, not an exception") {
    val junk = Seq(WireRecord(null, "not json".getBytes("UTF-8"),
      "t", 0, 0L, new Timestamp(0L), 0)).toDS().toDF()
    val out = KafkaSeam.decode(junk).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("platformId")))
  }

  test("reader seam compiles with the deploy options (load needs the connector)") {
    // the contract we CAN check without the jar: building the configured
    // reader succeeds; only load() requires spark-sql-kafka
    val r = KafkaSeam.reader(spark, "broker:9092", "metrics.log-request",
      minPartitions = 64)
    assert(r != null)
  }
}
