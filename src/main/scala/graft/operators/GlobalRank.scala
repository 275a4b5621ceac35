package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Checkpoints.TruncateOps

/** Dense global row numbers under a total order WITHOUT a single-reducer
  * window: `row_number() OVER (ORDER BY …)` with no PARTITION BY is the
  * classic scale trap — Catalyst plans it as one reducer holding the
  * whole table. This is the distributed equivalent (RDD.zipWithIndex's
  * shape, kept at the DataFrame level): range-repartition on the order,
  * sort within partitions, count each partition once (bounded driver
  * collect — one long per partition), broadcast the exclusive prefix
  * offsets back, and attach `offset + local index` in a second
  * per-partition pass.
  *
  * Callers must pass a TOTAL order (unique tiebreaker) for deterministic
  * numbering — same contract as [[RunLength.runProfile]].
  */
object GlobalRank {

  /** `df` plus a 1-based dense global row number `outCol` under
    * `orderCols`. Two passes over the (persisted) sorted frame, zero
    * wide shuffles beyond the range exchange. */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column],
      outCol: String, partitions: Int = 0): DataFrame =
    withGlobalRowNumberAndTotal(df, orderCols, outCol, partitions)._1

  /** [[withGlobalRowNumber]] plus the TOTAL row count — free on the
    * driver (the per-partition count collect already sums to it), so
    * callers needing (rank, n) closed forms (exact ntile tiling, CDF
    * denominators) pay no extra action. */
  def withGlobalRowNumberAndTotal(df: DataFrame, orderCols: Seq[Column],
      outCol: String, partitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    // repartitionByRange SAMPLES its input before shuffling it — on an
    // unpersisted upstream pipeline that evaluates the whole lineage
    // twice. Cache the input for the sample+shuffle pair.
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = in.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val countSchema = StructType(Seq(
        StructField("pid", LongType, nullable = false),
        StructField("cnt", LongType, nullable = false)))
      val counts = sorted.mapPartitions { it =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1L }
        if (c == 0L) Iterator.empty
        else Iterator.single(Row(TaskContext.getPartitionId().toLong, c))
      }(org.apache.spark.sql.Encoders.row(countSchema))
        .collect() // bounded: one row per partition
      var total = 0L
      val offsets: Map[Long, Long] = {
        var acc = 0L
        val m = counts.sortBy(_.getLong(0)).map { r =>
          val o = r.getLong(0) -> acc; acc += r.getLong(1); o
        }.toMap
        total = acc
        m
      }
      val bc = spark.sparkContext.broadcast(offsets)
      val outSchema = StructType(sorted.schema.fields :+
        StructField(outCol, LongType, nullable = false))
      val out = sorted.mapPartitions { it =>
        val base = bc.value.getOrElse(TaskContext.getPartitionId().toLong, 0L)
        var i = 0L
        it.map { r => i += 1L; Row.fromSeq(r.toSeq :+ (base + i)) }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      // Pin before unpersisting the lineage the result reads.
      (out.truncate(true), total)
    } finally { sorted.unpersist(); in.unpersist(): Unit }
  }
}
