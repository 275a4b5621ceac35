package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kinesis wire seam (SURVEY K5): everything the pipeline owns on
  * our side of the AWS Kinesis Data Streams PutRecords API, testable
  * without the connector jar or any AWS endpoint — the [[graft.sources.KafkaSeam]]
  * discipline applied to the reference's Kinesis metrics sink
  * (`P:job/contentmetrics/resources/15_create_kinesis_metrics_sink.sql`,
  * which is a Flink SQL `connector=kinesis, format=json` table; the
  * connector itself cannot run in this container, so the deploy-time
  * swap is exactly one `foreachPartition` that hands [[putBatchPlan]]
  * output to the SDK).
  *
  * Public contracts encoded here (AWS Kinesis Data Streams API
  * reference, PutRecords + CreateStream):
  *
  *  - a record is (partitionKey: UTF-8 string ≤ 256 chars, data: bytes);
  *    data + key must be ≤ 1 MiB ([[MaxRecordBytes]]);
  *  - a PutRecords request holds ≤ 500 records and ≤ 5 MiB total
  *    ([[MaxBatchRecords]]/[[MaxBatchBytes]]);
  *  - shard routing hashes the partition key with MD5 and routes the
  *    128-bit value into the shard's hash-key range; an evenly-split
  *    n-shard stream gives shard i the range [i·2¹²⁸/n, (i+1)·2¹²⁸/n).
  *
  * [[encode]]/[[decode]] convert between the typed metric frame and the
  * (partitionKey, data) wire frame with JSON as the container-available
  * stand-in format (the sink DDL in the reference is `format=json` too,
  * so unlike Kafka there is no protobuf swap to make). [[shardFor]] is
  * the proportional router ⌊h·n/2¹²⁸⌋ computed EXACTLY in two-limb
  * DECIMAL(38,0) arithmetic — bit-equal to the even-split range walk for
  * power-of-two shard counts (and within one record of it otherwise;
  * resharded streams carry explicit ranges and route SDK-side anyway).
  * [[putBatchPlan]] numbers records into PutRecords-shaped batches per
  * shard and flags every API limit violation loudly instead of letting
  * the SDK reject them at runtime. KinesisSeamSpec pins the round-trip,
  * the router against a BigInteger mirror, and the batch caps. */
object KinesisSeam {

  val MaxRecordBytes: Long = 1048576L // 1 MiB: Data + PartitionKey
  val MaxBatchRecords: Long = 500L
  val MaxBatchBytes: Long = 5242880L // 5 MiB per PutRecords request
  val MaxKeyChars: Int = 256

  /** Sink wire frame: what one PutRecords entry carries. */
  val wireSchema: StructType = StructType(Seq(
    StructField("partitionKey", StringType),
    StructField("data", BinaryType)))

  /** Typed frame → wire frame. `key` is the shard-affinity identity
    * (the reference's metrics sink keys by content id, so one content's
    * metric stream stays ordered within its shard). */
  def encode(df: DataFrame, key: Column): DataFrame =
    df.select(key.cast("string").as("partitionKey"),
      to_json(struct(df.columns.map(col): _*)).cast("binary").as("data"))

  /** Wire frame → typed frame under the consumer's declared schema. */
  def decode(wire: DataFrame, schema: StructType): DataFrame =
    wire.select(from_json(col("data").cast("string"), schema).as("env"))
      .select(schema.fieldNames.map(n => col(s"env.$n").as(n)): _*)

  /** Shard routing: ⌊md5_128(partitionKey) · nShards / 2¹²⁸⌋, exact.
    * Two-limb form (hi, lo = the unsigned 64-bit halves of the MD5):
    * ⌊h·n/2⁶⁴⌋ = hi·n + ⌊lo·n/2⁶⁴⌋, then one more ⌊·/2⁶⁴⌋ — both in
    * DECIMAL(38,0) (hi·n ≤ 1.8e19·n stays inside 38 digits for any
    * realistic shard count). `conv(hex, 16, 10)` parses the halves
    * unsigned. */
  def shardFor(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 100000,
      s"nShards $nShards out of range")
    val hex = md5(key.cast("string").cast("binary"))
    val hiC = conv(substring(hex, 1, 16), 16, 10).cast(DecimalType(38, 0))
    val loC = conv(substring(hex, 17, 16), 16, 10).cast(DecimalType(38, 0))
    val two64 = lit("18446744073709551616").cast(DecimalType(38, 0))
    val n = lit(nShards.toLong).cast(DecimalType(38, 0))
    // DECIMAL `/` rounds (HALF_UP at result scale), which would misroute
    // ~1-in-1e6 keys sitting just under a range boundary; the
    // (x − pmod(x,b))/b identity divides an exact multiple, so the
    // quotient is exact at any scale (operands non-negative here)
    def exactDiv(x: Column, b: Column): Column =
      ((x - pmod(x, b)) / b).cast(DecimalType(38, 0))
    val lowTerm = exactDiv(loC * n, two64)
    exactDiv(hiC * n + lowTerm, two64).cast("int")
  }

  /** PutRecords batch plan: per shard (caller-supplied order columns fix
    * the in-shard sequence), records number into batches of ≤ 500; the
    * output carries the per-record byte weight, the batch id, and two
    * LOUD violation flags — `oversized` (record > 1 MiB or key > 256
    * chars: the API rejects it regardless of batching) and
    * `batch_over_bytes` (a 500-record batch exceeding 5 MiB: the writer
    * callback must halve such batches before submit; with the
    * reference's ~100-byte metric rows a full batch is ~50 KB, so the
    * flag firing at all means the envelope grew 100×). Count-based
    * numbering is exact greedy packing for the record cap; the byte cap
    * is validated, not packed — exact byte-greedy packing is an
    * order-dependent reset fold that belongs in the writer callback,
    * and flagging keeps THIS plan one window pass at any scale. */
  def putBatchPlan(wire: DataFrame, nShards: Int,
      orderBy: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(orderBy: _*)
    val sized = wire
      .withColumn("shard", shardFor(col("partitionKey"), nShards))
      .withColumn("rec_bytes",
        length(col("data")).cast("long") +
          length(col("partitionKey")).cast("long"))
      .withColumn("oversized",
        col("rec_bytes") > MaxRecordBytes ||
          length(col("partitionKey")) > MaxKeyChars)
    val numbered = sized
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("batch", expr(s"__rn div $MaxBatchRecords"))
      .withColumn("batch_slot", expr(s"__rn % $MaxBatchRecords"))
      .drop("__rn")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"), col("batch"))
    numbered
      .withColumn("batch_bytes", sum(col("rec_bytes")).over(wb))
      .withColumn("batch_over_bytes", col("batch_bytes") > MaxBatchBytes)
  }
}
