package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: `graft-audit` — a write-and-audit sink that
  * exercises Spark's full connector commit protocol (WriteBuilder →
  * BatchWrite → per-task DataWriter → WriterCommitMessage → driver-side
  * commit). Each task accumulates row counts and per-column LONG sums
  * while the data streams through; task commit messages carry ONLY the
  * tiny accumulator, and the job commit writes one summary file:
  *
  *   {"rows": N, "tasks": T, "sums": {"cents": …}}
  *
  * Why this shape matters at 100 TB: write-time auditing is free (the
  * rows are already in hand — no second read pass), and the commit
  * protocol is exactly where exactly-once accounting lives — a failed /
  * speculative task's accumulator is never double-counted because only
  * COMMITTED task messages reach `commit()`. This is the data-quality
  * tripwire pattern (publish counts WITH the write, compare downstream)
  * and the minimal honest demonstration of the V2 write surface
  * (the reference's Kafka/Redis sinks carry their own delivery
  * accounting the same way).
  *
  *   df.write.format("graft-audit")
  *     .option("path", dir).option("sumCols", "cents")
  *     .mode("append").save()
  *
  * `sumCols` must be LongType columns; NULLs count toward `rows` but
  * not the sums. Mode is append-only (a pure audit accumulates; rerun
  * into a fresh path for idempotence — the summary carries no data to
  * truncate).
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, new CaseInsensitiveStringMap(properties))
}

class AuditTable(writeSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-audit(${options.get("path")})"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite of a pure audit sink is a no-op on data (there is
      // none); accept it so SaveMode.Overwrite also works
      override def truncate(): WriteBuilder = this
      override def build(): Write = new AuditWrite(info)
    }
}

class AuditWrite(info: LogicalWriteInfo) extends Write {
  override def toBatch: BatchWrite = new AuditBatchWrite(info)
  override def toStreaming: StreamingWrite = new AuditStreamingWrite(info)
}

case class AuditTaskStats(rows: Long, sums: Map[String, Long])
    extends WriterCommitMessage

class AuditBatchWrite(info: LogicalWriteInfo) extends BatchWrite {
  private val path = {
    val p = info.options.get("path")
    require(p != null && p.nonEmpty, "graft-audit requires option 'path'")
    p
  }
  private val sumCols: Seq[String] =
    Option(info.options.get("sumCols")).map(_.split(",").toSeq.map(_.trim)
      .filter(_.nonEmpty)).getOrElse(Nil)

  override def createBatchWriterFactory(
      pInfo: PhysicalWriteInfo): DataWriterFactory = {
    val schema = info.schema()
    val idx = sumCols.map { c =>
      val i = schema.fieldIndex(c)
      require(schema.fields(i).dataType == LongType,
        s"graft-audit sums LongType columns only; '$c' is " +
          schema.fields(i).dataType.simpleString)
      c -> i
    }
    new AuditWriterFactory(idx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    commitAs("summary.json", messages)

  private[v2] def commitAs(fileName: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.collect { case s: AuditTaskStats => s }
    val rows = stats.map(_.rows).sum
    val sums = sumCols.map { c =>
      c -> stats.map(_.sums.getOrElse(c, 0L)).sum
    }
    val json = {
      val sumJson = sums.map { case (c, v) => s""""$c":$v""" }
        .mkString("{", ",", "}")
      s"""{"rows":$rows,"tasks":${stats.length},"sums":$sumJson}"""
    }
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // create + rename so a reader never sees a partial summary
    val tmp = new Path(dir, s"_$fileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dir, fileName)
    fs.delete(dst, false) // replayed epoch: last write wins, idempotent
    fs.rename(tmp, dst): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Per-epoch streaming flavor: identical accumulator writers; each
  * micro-batch commit publishes `summary_epoch_<id>.json`, so the audit
  * trail is one tiny file per epoch (sum them downstream) and a replayed
  * epoch overwrites its own file idempotently — exactly-once accounting
  * under retries. */
class AuditStreamingWrite(info: LogicalWriteInfo) extends StreamingWrite {
  private val batch = new AuditBatchWrite(info)

  override def createStreamingWriterFactory(
      pInfo: PhysicalWriteInfo): StreamingDataWriterFactory =
    batch.createBatchWriterFactory(pInfo)
      .asInstanceOf[AuditWriterFactory]

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    batch.commitAs(s"summary_epoch_$epochId.json", messages)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

class AuditWriterFactory(sumIdx: Seq[(String, Int)])
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    createWriter(partitionId, taskId)
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private val acc = scala.collection.mutable.LinkedHashMap(
        sumIdx.map { case (c, _) => c -> 0L }: _*)
      override def write(r: InternalRow): Unit = {
        rows += 1
        sumIdx.foreach { case (c, i) =>
          if (!r.isNullAt(i)) acc(c) += r.getLong(i)
        }
      }
      override def commit(): WriterCommitMessage =
        AuditTaskStats(rows, acc.toMap)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
