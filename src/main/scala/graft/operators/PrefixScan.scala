package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
      outCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__psv", valueCol.cast("long"))
    val sorted = withV.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val vIdx = sorted.schema.fieldIndex("__psv")
      val sumSchema = StructType(Seq(
        StructField("pid", LongType, nullable = false),
        StructField("mx", LongType, nullable = false)))
      val maxes = sorted.mapPartitions { it =>
        var mx = Long.MinValue; var any = false
        while (it.hasNext) { mx = math.max(mx, it.next().getLong(vIdx)); any = true }
        if (!any) Iterator.empty
        else Iterator.single(Row(TaskContext.getPartitionId().toLong, mx))
      }(org.apache.spark.sql.Encoders.row(sumSchema))
        .collect() // bounded: one row per partition
      val prefix: Map[Long, Long] = {
        var acc = Long.MinValue
        maxes.sortBy(_.getLong(0)).map { r =>
          val o = r.getLong(0) -> acc; acc = math.max(acc, r.getLong(1)); o
        }.toMap
      }
      val bc = spark.sparkContext.broadcast(prefix)
      val outSchema = StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false))
      val out = sorted.mapPartitions { it =>
        var run = bc.value.getOrElse(
          TaskContext.getPartitionId().toLong, Long.MinValue)
        it.map { r =>
          run = math.max(run, r.getLong(vIdx))
          Row.fromSeq(r.toSeq :+ run)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      out.localCheckpoint(true).drop("__psv")
    } finally sorted.unpersist(): Unit
  }
}
