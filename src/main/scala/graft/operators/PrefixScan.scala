package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Checkpoints.TruncateOps

/** Distributed prefix scan for a running MAX over a total order —
  * `max(v) OVER (ORDER BY …)` without the single-reducer window: the
  * same two-pass shape as [[GlobalRank]] (range-repartition + sort,
  * bounded per-partition summary collect, broadcast exclusive prefix,
  * second per-partition pass), with max as the carried monoid instead
  * of count. The classic parallel-scan decomposition (Blelloch 1990)
  * specialized to Spark's range exchange.
  */
object PrefixScan {

  /** `df` plus `outCol` = max of `valueCol` over all rows at-or-before
    * the current one under the total order `orderCols` (inclusive
    * running max). `valueCol` must be BIGINT-castable and non-null. */
  def runningMax(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      outCol: String, partitions: Int = 0): DataFrame =
    scanLong(df, orderCols, valueCol, outCol, Long.MinValue, math.max,
      partitions)

  /** Inclusive running SUM under a total order — same two-pass shape,
    * + as the carried monoid. The interval-concurrency sweep's engine:
    * +1/−1 boundary deltas in, the step function out. */
  def runningSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      outCol: String, partitions: Int = 0): DataFrame =
    scanLong(df, orderCols, valueCol, outCol, 0L, _ + _, partitions)

  private def scanLong(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, outCol: String, zero: Long,
      op: (Long, Long) => Long, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    // cached for repartitionByRange's sample+shuffle double read (the
    // GlobalRank rule — an unpersisted lineage would evaluate twice)
    val withV = df.withColumn("__psv", valueCol.cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = withV.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vIdx = sorted.schema.fieldIndex("__psv")
      val sumSchema = StructType(Seq(
        StructField("pid", LongType, nullable = false),
        StructField("mx", LongType, nullable = false)))
      val partials = sorted.mapPartitions { it =>
        var agg = zero; var any = false
        while (it.hasNext) { agg = op(agg, it.next().getLong(vIdx)); any = true }
        if (!any) Iterator.empty
        else Iterator.single(Row(TaskContext.getPartitionId().toLong, agg))
      }(org.apache.spark.sql.Encoders.row(sumSchema))
        .collect() // bounded: one row per partition
      val prefix: Map[Long, Long] = {
        var acc = zero
        partials.sortBy(_.getLong(0)).map { r =>
          val o = r.getLong(0) -> acc; acc = op(acc, r.getLong(1)); o
        }.toMap
      }
      val bc = spark.sparkContext.broadcast(prefix)
      val outSchema = StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false))
      val out = sorted.mapPartitions { it =>
        var run = bc.value.getOrElse(
          TaskContext.getPartitionId().toLong, zero)
        it.map { r =>
          run = op(run, r.getLong(vIdx))
          Row.fromSeq(r.toSeq :+ run)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      out.truncate(true).drop("__psv")
    } finally { sorted.unpersist(); withV.unpersist(): Unit }
  }
}
