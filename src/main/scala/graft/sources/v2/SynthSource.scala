package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required = SynthSource.schema
  private var aggSpec: Option[SynthAgg] = None

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

  /** Partial-aggregate pushdown (`SupportsPushDownAggregates`): the
    * generator computes per-partition COUNT/SUM/MIN/MAX groups at
    * generation time and ships ONE row per (partition, group) instead of
    * the raw id range — at synthetic-benchmark scale the difference
    * between emitting 10^10 rows into an exchange and emitting
    * `partitions × |groups|`. `supportCompletePushDown` stays false:
    * Spark's final aggregate merges the partials (SUM of counts/sums,
    * MIN of mins, MAX of maxes), which keeps this correct under any
    * partitioning. COUNT(col) folds to COUNT(*) because every generated
    * column is non-null by construction. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    def colName(e: V2Expression): Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 &&
          SynthSource.schema.fieldNames.contains(f.fieldNames.head) =>
        Some(f.fieldNames.head)
      case _ => None
    }
    val groups = agg.groupByExpressions.toSeq.map(colName)
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some((SynthAgg.Cnt, "id"))
      case c: Count if !c.isDistinct =>
        colName(c.column).map(n => (SynthAgg.Cnt, n))
      case s: Sum if !s.isDistinct =>
        colName(s.column).filter(_ != "event_type")
          .map(n => (SynthAgg.SumF, n))
      case m: Min => colName(m.column).map(n => (SynthAgg.MinF, n))
      case m: Max => colName(m.column).map(n => (SynthAgg.MaxF, n))
      case _ => None
    }
    if (groups.forall(_.isDefined) && funcs.forall(_.isDefined)) {
      aggSpec = Some(SynthAgg(groups.flatten, funcs.flatten))
      true
    } else false
  }

  override def build(): Scan = aggSpec match {
    case Some(a) =>
      new SynthAggScan(math.min(lo, hi), hi, partitions, seed, a, pushed)
    case None =>
      new SynthScan(math.min(lo, hi), hi, partitions, seed, required,
        rowsPerBatch)
  }
}

/** A pushed aggregation over the generator: `groupCols` then one
  * `(op, col)` per aggregate, in Spark's requested order (the scan's
  * output columns follow the same order; Spark casts/renames above). */
case class SynthAgg(groupCols: Seq[String], funcs: Seq[(Int, String)]) {
  def readSchema: StructType = StructType(
    groupCols.map(c => SynthSource.schema(c)) ++
      funcs.zipWithIndex.map { case ((op, c), i) =>
        val dt = if (op == SynthAgg.Cnt) LongType
          else SynthSource.schema(c).dataType
        StructField(s"agg_$i", dt, nullable = false)
      })
  def describe: String = {
    val fs = funcs.map {
      case (SynthAgg.Cnt, _) => "COUNT(*)"
      case (SynthAgg.SumF, c) => s"SUM($c)"
      case (SynthAgg.MinF, c) => s"MIN($c)"
      case (SynthAgg.MaxF, c) => s"MAX($c)"
    }
    s"PushedAggregates: [${fs.mkString(", ")}], " +
      s"PushedGroupByExpressions: [${groupCols.mkString(", ")}]"
  }
}

object SynthAgg {
  val Cnt = 0; val SumF = 1; val MinF = 2; val MaxF = 3
}

class SynthAggScan(lo: Long, hi: Long, partitions: Int, seed: Long,
    agg: SynthAgg, pushedFilters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = agg.readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth [$lo, $hi) seed=$seed, ${agg.describe}, " +
      s"PushedFilters: [${pushedFilters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    if (span == 0L) Array.empty
    else (0 until partitions).iterator.map { p =>
      SynthRange(lo + span * p / partitions, lo + span * (p + 1) / partitions)
    }.filter(r => r.hi > r.lo).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory(seed, agg)
}

class SynthAggReaderFactory(seed: Long, agg: SynthAgg)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new PartitionReader[InternalRow] {
      // group key (as a Seq of the derived values) → accumulator array
      private val groups =
        new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
      private var it: java.util.Iterator[
        java.util.Map.Entry[Seq[Any], Array[Any]]] = _
      private var cur: java.util.Map.Entry[Seq[Any], Array[Any]] = _

      private def field(name: String, id: Long, h: Long): Any = name match {
        case "id" => id
        case "user_id" => SynthSource.userId(h)
        case "event_type" =>
          UTF8String.fromString(SynthSource.eventTypes(SynthSource.typeIdx(h)))
        case "cents" => SynthSource.cents(h)
        case "day" => SynthSource.day(h)
      }

      private def lt(a: Any, b: Any): Boolean = (a, b) match {
        case (x: Long, y: Long) => x < y
        case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
        case _ => false
      }

      private def ensure(): Unit = {
        if (it != null) return
        var id = r.lo
        while (id < r.hi) {
          val h = RollingHash.splitMix64(seed + id)
          val key = agg.groupCols.map(field(_, id, h))
          var acc = groups.get(key)
          if (acc == null) {
            // identity seeds: count 0, sum 0, min/max null (first row wins)
            acc = agg.funcs.map { case (op, _) =>
              if (op == SynthAgg.Cnt || op == SynthAgg.SumF) 0L else null
            }.toArray[Any]
            groups.put(key, acc)
          }
          var i = 0
          while (i < agg.funcs.length) {
            val (op, c) = agg.funcs(i)
            op match {
              case SynthAgg.Cnt =>
                acc(i) = acc(i).asInstanceOf[Long] + 1L
              case SynthAgg.SumF =>
                acc(i) = acc(i).asInstanceOf[Long] +
                  field(c, id, h).asInstanceOf[Long]
              case SynthAgg.MinF =>
                val v = field(c, id, h)
                if (acc(i) == null || lt(v, acc(i))) acc(i) = v
              case SynthAgg.MaxF =>
                val v = field(c, id, h)
                if (acc(i) == null || lt(acc(i), v)) acc(i) = v
            }
            i += 1
          }
          id += 1
        }
        it = groups.entrySet().iterator()
      }

      override def next(): Boolean = { ensure(); it.hasNext && {
        cur = it.next(); true } }
      override def get(): InternalRow =
        InternalRow.fromSeq(cur.getKey ++ cur.getValue.toSeq)
      override def close(): Unit = ()
    }
  }
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
