package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class KinesisSeamSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode round-trips a typed metric frame") {
    val rows = Seq((1L, "2024-01-01", 10L, 250L), (2L, "2024-01-02", 3L, 99L))
      .toDF("content_id", "dt", "views", "revenue_cents")
    val wire = KinesisSeam.encode(rows, col("content_id"))
    // nullability is derivation-dependent; the field/type contract is what
    // the API fixes
    assert(wire.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      KinesisSeam.wireSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val back = KinesisSeam.decode(wire, StructType(Seq(
      StructField("content_id", LongType), StructField("dt", StringType),
      StructField("views", LongType),
      StructField("revenue_cents", LongType))))
    assert(back.orderBy("content_id").collect().toSeq ==
      rows.orderBy("content_id").collect().toSeq)
  }

  test("shardFor matches a BigInteger md5-range mirror for every key") {
    val keys = (0 until 1000).map(i => s"key-$i")
    for (n <- Seq(1, 2, 7, 32, 1000)) {
      val got = keys.toDF("k")
        .select(col("k"), KinesisSeam.shardFor(col("k"), n).as("s"))
        .as[(String, Int)].collect().toMap
      keys.foreach { k =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(k.getBytes("UTF-8"))
        val h = new java.math.BigInteger(1, md)
        val expect = h.multiply(java.math.BigInteger.valueOf(n))
          .shiftRight(128).intValueExact()
        assert(got(k) == expect, s"key $k n $n")
      }
    }
  }

  test("shardFor is total and in-range on adversarial keys") {
    val keys = Seq("", "a", "é", "x" * 256)
    val got = keys.toDF("k")
      .select(KinesisSeam.shardFor(col("k"), 16)).as[Int].collect()
    assert(got.forall(s => s >= 0 && s < 16))
  }

  test("putBatchPlan: 500-record batches per shard, loud violations") {
    val rows = (0 until 2600).map(i => (s"pk${i % 3}", s"payload-$i"))
      .toDF("pk", "body")
    val wire = KinesisSeam.encode(rows, col("pk"))
    val plan = KinesisSeam.putBatchPlan(wire, nShards = 2,
      orderBy = Seq(col("partitionKey"), col("data")))
    val agg = plan.groupBy("shard", "batch")
      .agg(count(lit(1)).as("n"), max("batch_slot").as("mx"),
        max(col("oversized").cast("int")).as("bad"),
        max(col("batch_over_bytes").cast("int")).as("over"))
      .collect()
    assert(agg.forall(r => r.getLong(2) <= 500L))
    assert(agg.forall(r => r.getLong(3) == r.getLong(2) - 1)) // dense slots
    assert(agg.forall(r => r.getInt(4) == 0 && r.getInt(5) == 0))
    // batches are numbered densely from 0 per shard
    val perShard = agg.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    perShard.values.foreach(bs => assert(bs == (0L until bs.size)))
    // total records conserved
    assert(agg.map(_.getLong(2)).sum == 2600L)
  }

  test("putBatchPlan flags an oversized record instead of burying it") {
    val big = "x" * (KinesisSeam.MaxRecordBytes.toInt + 10)
    val rows = Seq(("k1", big), ("k2", "small")).toDF("pk", "body")
    val plan = KinesisSeam.putBatchPlan(
      KinesisSeam.encode(rows, col("pk")), nShards = 4,
      orderBy = Seq(col("data")))
    val flags = plan.select("partitionKey", "oversized")
      .as[(String, Boolean)].collect().toMap
    assert(flags("k1") && !flags("k2"))
  }
}
