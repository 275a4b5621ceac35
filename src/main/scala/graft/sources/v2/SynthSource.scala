package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RollingHash

/** DataSource V2: `graft-synth` — a deterministic synthetic-events
  * generator table (the batch sibling of Spark's `rate` source; the
  * reference's synthetic LogRequest generators fill the same role in
  * its test rigs, pipeline/.../fake* generators).
  *
  * Why a SOURCE and not a `spark.range(...).select(...)` helper: at
  * cluster scale, load tests and benchmark corpora need data that (a)
  * generates in parallel partitions with zero I/O, (b) never
  * materializes columns a query doesn't read, and (c) prunes whole
  * partitions when the query filters the id space. A V2 table gets all
  * three from Catalyst for free once the ScanBuilder implements the
  * pushdown interfaces — and proves this library speaks Spark's
  * connector API, not just its DataFrame surface.
  *
  *   spark.read.format("graft-synth")
  *     .option("rows", 200000).option("seed", 7).option("partitions", 32)
  *     .load()
  *
  * Schema: id, user_id, cents, day BIGINT + event_type STRING. Every
  * column derives from splitMix64(seed + id) ([[RollingHash.splitMix64]]
  * — the engine-standard finisher), through LOGICAL shifts ≥ 1 before
  * any modulus so signed/unsigned readings agree and a SQL oracle can
  * replay the generator bit-exactly in unsigned arithmetic.
  *
  * Pushdown contract (pinned in SynthSourceSpec):
  *  - `SupportsPushDownRequiredColumns`: the reader generates ONLY the
  *    pruned schema's fields;
  *  - `SupportsPushDownFilters`: >/>=/</<=/= on `id` narrow the
  *    generated range [lo, hi) itself — filter-as-generation-bounds,
  *    the source-side analogue of partition pruning (a one-day slice of
  *    a 100 TB synthetic corpus costs one day, not a full scan + drop);
  *    everything else stays residual for Spark to evaluate.
  *  - `planInputPartitions`: the final range splits into `partitions`
  *    near-equal contiguous slices.
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("day", LongType, nullable = false)))

  val eventTypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  /** The row for `id` under `seed`, field by field. Shifts are logical
    * and ≥ 1, so every modulus sees a non-negative long — identical to
    * an unsigned replay (the q304 oracle's UBIGINT arithmetic). */
  @inline def userId(h: Long): Long = (h >>> 1) % 10000L
  @inline def typeIdx(h: Long): Int = ((h >>> 8) % 5L).toInt
  @inline def cents(h: Long): Long = (h >>> 16) % 100000L
  @inline def day(h: Long): Long = (h >>> 24) % 90L
}

class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rows = options.getLong("rows", 1000L)
  private val partitions = options.getInt("partitions", 4)
  private val seed = options.getLong("seed", 0L)
  private val rowsPerBatch = options.getLong("rowsPerBatch", 100L)
  require(rows >= 0 && partitions >= 1 && rowsPerBatch >= 1)

  override def name(): String = s"graft-synth(rows=$rows, seed=$seed)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, seed, rowsPerBatch)
}

class SynthScanBuilder(rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long = 100L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SynthSource.schema

  private def narrow(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
    case GreaterThan("id", v: Long) =>
      if (v < Long.MaxValue) { lo = math.max(lo, v + 1) }; true
    case LessThan("id", v: Long) => hi = math.min(hi, v); true
    case LessThanOrEqual("id", v: Long) =>
      if (v < Long.MaxValue) { hi = math.min(hi, v + 1) }; true
    case EqualTo("id", v: Long) =>
      lo = math.max(lo, v); hi = math.min(hi, v + 1); true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(narrow)
    pushed = accepted
    residual // Spark re-evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(math.min(lo, hi), hi, partitions, seed, required,
      rowsPerBatch)
}

case class SynthRange(lo: Long, hi: Long) extends InputPartition

class SynthScan(lo: Long, hi: Long, partitions: Int, seed: Long,
    required: StructType, rowsPerBatch: Long = 100L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, partitions, seed, required,
      rowsPerBatch)
  override def description(): String =
    s"graft-synth [$lo, $hi) seed=$seed cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    if (span == 0L) Array(SynthRange(lo, lo))
    else (0 until partitions).iterator.map { p =>
      val a = lo + span * p / partitions
      val b = lo + span * (p + 1) / partitions
      SynthRange(a, b)
    }.filter(r => r.hi > r.lo).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required.fieldNames)
}

/** Micro-batch flavor: the id space [lo, hi) is the offset axis — each
  * trigger advances by at most `rowsPerBatch` ids through the
  * SupportsAdmissionControl path (latestOffset(start, limit) is
  * STATELESS: the engine hands back the committed offset, so restarts
  * resume exactly — instance state here would desync from the offset
  * log, and measurably re-emitted the gap in an earlier stateful
  * version). A batch replays [start, end) deterministically with the
  * same splitMix64 derivations as the batch scan — the replayable-source
  * contract Structured Streaming's exactly-once model needs, in its
  * minimal honest form (the shape Kafka offsets have). Offsets
  * serialize as the plain id long; parsing goes through Offset.json()
  * so the engine's SerializedOffset wrappers work too. */
class SynthMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    seed: Long, required: StructType, rowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class SynthOffset(id: Long) extends Offset {
    override def json(): String = id.toString
  }

  private def idOf(o: Offset): Long = o.json().trim.toLong

  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    SynthOffset(math.min(idOf(start) + rowsPerBatch, hi))
  override def reportLatestOffset(): Offset = SynthOffset(hi)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the only path")
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = idOf(start)
    val e = math.min(idOf(end), hi)
    val span = math.max(0L, e - s)
    if (span == 0L) Array.empty
    else (0 until partitions).iterator.map { p =>
      SynthRange(s + span * p / partitions, s + span * (p + 1) / partitions)
    }.filter(r => r.hi > r.lo).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required.fieldNames)
}

class SynthReaderFactory(seed: Long, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        val h = RollingHash.splitMix64(seed + id)
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => id
          case "user_id" => SynthSource.userId(h)
          case "event_type" =>
            UTF8String.fromString(SynthSource.eventTypes(SynthSource.typeIdx(h)))
          case "cents" => SynthSource.cents(h)
          case "day" => SynthSource.day(h)
        })
      }
      override def close(): Unit = ()
    }
  }
}
