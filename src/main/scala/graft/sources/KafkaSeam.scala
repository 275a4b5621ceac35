package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.LogRequest

/** The Kafka wire seam (SURVEY S1/K2): everything the pipeline owns on
  * either side of `format("kafka")`, testable without a broker.
  *
  * The reference consumes protobuf `LogRequest` records from Kafka and
  * produces flat records back to Kafka (SURVEY §1.1). The spark-sql-kafka
  * connector's column contracts are public and fixed:
  *
  *  - source emits exactly [[wireSchema]] (key/value binary, topic,
  *    partition, offset, timestamp, timestampType — plus `headers` when
  *    `includeHeaders` is set);
  *  - sink consumes `value` (required) with optional `key`/`topic`/
  *    `partition`/`headers`.
  *
  * [[decode]]/[[encode]] convert between those wire frames and the typed
  * envelope frame every job stage consumes — so the ONLY deploy-time swap
  * is the transport format: this container has no protobuf runtime or
  * broker, so the codec is JSON (`from_json`/`to_json`, core Spark); a
  * real deployment replaces those two calls with `from_protobuf`/
  * `to_protobuf` (spark-protobuf, same binary-column contract) and points
  * [[reader]] at its brokers. KafkaSeamSpec pins the wire schema against
  * the connector's published contract and round-trips nested envelopes
  * through encode→decode, batch and streaming.
  */
object KafkaSeam {

  /** Exact source output schema of spark-sql-kafka (without
    * `includeHeaders`) — the published contract of the connector,
    * Structured Streaming + Kafka Integration Guide. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The envelope schema [[decode]] produces — derived from the one
    * `LogRequest` definition, so codec and consumers cannot drift. */
  val envelopeSchema: StructType = Encoders.product[LogRequest].schema

  /** Configured STREAMING Kafka reader — the deploy-time source seam
    * (the pipeline is a continuous consumer, so this must be readStream;
    * the batch `spark.read.format("kafka")` source ignores
    * maxOffsetsPerTrigger and reads the whole topic once). `load()` on
    * the result requires the connector jar on the classpath (absent in
    * this container; the options are the compile-checked contract).
    * maxOffsetsPerTrigger bounds per-micro-batch work (backfill safety);
    * minPartitions lets 32 Kafka partitions fan out to 1000 cores. */
  def reader(spark: SparkSession, brokers: String, topics: String,
      maxOffsetsPerTrigger: Long = 10000000L,
      minPartitions: Int = 0): DataStreamReader = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
    if (minPartitions > 0) r.option("minPartitions", minPartitions) else r
  }

  /** JSON cannot key a map with anything but strings, so the stand-in
    * codec parses long-keyed maps (sparseFeatures) as string-keyed and
    * casts back — a JSON-only artifact; from_protobuf needs neither. */
  private def jsonSafe(dt: DataType): DataType = dt match {
    case StructType(fields) =>
      StructType(fields.map(f => f.copy(dataType = jsonSafe(f.dataType))))
    case ArrayType(et, n) => ArrayType(jsonSafe(et), n)
    case MapType(k, v, n) =>
      MapType(if (k == StringType) k else StringType, jsonSafe(v), n)
    case other => other
  }

  /** Everything-nullable view of a type — the cast target after from_json,
    * which cannot promise the encoder's NOT NULL marks. */
  private def relaxed(dt: DataType): DataType = dt match {
    case StructType(fields) => StructType(fields.map(f =>
      f.copy(dataType = relaxed(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(relaxed(et), containsNull = true)
    case MapType(k, v, _) => MapType(relaxed(k), relaxed(v), valueContainsNull = true)
    case other => other
  }

  /** Wire frame → typed envelope frame (the input of LogRequestSplit).
    * A record whose value fails to parse becomes an all-null envelope row
    * (from_json semantics) — route those to the reject side channel with
    * `Validation` rather than dropping silently. */
  def decode(wire: DataFrame): DataFrame = {
    val safe = jsonSafe(envelopeSchema).asInstanceOf[StructType]
    wire.select(from_json(col("value").cast("string"), safe).as("env"))
      .select(envelopeSchema.fields.map(f =>
        col(s"env.${f.name}").cast(relaxed(f.dataType)).as(f.name)): _*)
  }

  /** Typed envelope frame → sink wire frame. `key` should be the
    * partitioning identity (reference: log-user key, so one user's events
    * land in one Kafka partition in order). */
  def encode(envelopes: DataFrame, key: Column): DataFrame =
    envelopes.select(
      key.cast("string").cast("binary").as("key"),
      to_json(struct(envelopes.columns.map(col): _*)).cast("binary").as("value"))
}
