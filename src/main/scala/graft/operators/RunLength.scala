package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Run-length layout advisor: for a candidate table sort order, how many
  * value RUNS does each column collapse to? Run count is the direct
  * proxy for RLE/dictionary-page compressibility (Parquet's RLE_DICTIONARY
  * encodes a run in O(1)), so comparing profiles across candidate sort
  * keys answers "which ORDER BY makes this 100 TB table smallest/
  * fastest to scan" — the same decision Z-ordering (q61) makes for skip
  * stats, here for storage size.
  *
  * Scale shape: the naive form is a global-order window (`lag` over
  * ORDER BY without PARTITION BY) — a single-reducer plan that cannot
  * work at scale. Instead: `repartitionByRange` + `sortWithinPartitions`
  * (Spark's own total-sort shape, range bounds from a driver sample),
  * ONE `mapPartitions` pass counting runs per partition (genuine
  * per-partition imperative logic), then a bounded driver stitch —
  * partitions × columns summary rows — subtracting the boundary seams
  * where one partition's last value equals the next one's first. The
  * data itself is scanned exactly once and never shuffled beyond the
  * range exchange.
  *
  * Determinism: callers must pass a TOTAL sort order (include a unique
  * tiebreaker); under ties the within-run order of other columns would
  * otherwise be partitioning-dependent. Boundary equality compares the
  * values' string forms (exact for the integer/string/date columns this
  * targets).
  */
object RunLength {

  /** Per-column run counts of `df` under the total order `sortCols`.
    * Output: one row per profiled column — (col_name STRING, runs
    * BIGINT, n_rows BIGINT). */
  def runProfile(df: DataFrame, sortCols: Seq[Column],
      valueCols: Seq[String], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val sortKeys = sortCols.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }
    val proj = df.select(sortKeys ++ valueCols.map(col): _*)
    val keyRefs = sortCols.indices.map(i => col(s"__s$i"))
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = proj.repartitionByRange(n, keyRefs: _*)
      .sortWithinPartitions(keyRefs: _*)

    val nSort = sortCols.length
    val names = valueCols.toArray
    // One summary row per (partition, column): runs inside the
    // partition, row count, and the boundary values for the stitch.
    val summarySchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("col_name", StringType, nullable = false),
      StructField("runs", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("first_v", StringType, nullable = true),
      StructField("last_v", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(summarySchema)
    val partRows = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        val k = names.length
        val runs = new Array[Long](k)
        val first = new Array[String](k)
        val prev = new Array[String](k)
        var rows = 0L
        while (it.hasNext) {
          val r = it.next()
          var i = 0
          while (i < k) {
            val v = r.get(nSort + i)
            val s = if (v == null) null else v.toString
            if (rows == 0L) { first(i) = s; runs(i) += 1 }
            else if (!java.util.Objects.equals(s, prev(i))) runs(i) += 1
            prev(i) = s
            i += 1
          }
          rows += 1L
        }
        (0 until k).iterator.map(i =>
          Row(pid, names(i), runs(i), rows, first(i), prev(i)))
      }
    }(enc).collect() // bounded: ≤ partitions × columns rows

    // Stitch: seams where adjacent partitions meet on an equal value
    // were counted twice — subtract one per matching seam.
    val totals = names.map { cn =>
      val per = partRows.filter(_.getString(1) == cn).sortBy(_.getInt(0))
      var runs = 0L; var rows = 0L
      var havePrev = false; var prevLast: String = null
      per.foreach { r =>
        runs += r.getLong(2); rows += r.getLong(3)
        if (havePrev && java.util.Objects.equals(prevLast, r.getString(4)))
          runs -= 1
        prevLast = r.getString(5); havePrev = true
      }
      Row(cn, runs, rows)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(totals.toSeq, 1),
      StructType(Seq(
        StructField("col_name", StringType, nullable = false),
        StructField("runs", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  }

  private def zigzag(d: Long): Long = (d << 1) ^ (d >> 63)
  private def bitlen(x: Long): Long =
    if (x == 0L) 1L else 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** Delta-encoding advisor — the numeric sibling of [[runProfile]]:
    * total zigzag-delta bit mass Σ bitlen(zigzag(vᵢ − vᵢ₋₁)) per
    * non-null BIGINT column under the total order (first row deltas
    * from 0), i.e. the payload a Parquet DELTA_BINARY_PACKED page would
    * carry. Same one-scan shape: per-partition accumulation, bounded
    * (first, last, bits) stitch that re-prices each seam's first delta
    * against the previous partition's last value.
    * Output: (col_name, delta_bits, n_rows). */
  def deltaProfile(df: DataFrame, sortCols: Seq[Column],
      longCols: Seq[String], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val sortKeys = sortCols.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }
    val proj = df.select(sortKeys ++
      longCols.map(c => col(c).cast("long").as(c)): _*)
    val keyRefs = sortCols.indices.map(i => col(s"__s$i"))
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = proj.repartitionByRange(n, keyRefs: _*)
      .sortWithinPartitions(keyRefs: _*)
    val nSort = sortCols.length
    val names = longCols.toArray
    val schema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      StructField("col_name", StringType, nullable = false),
      StructField("bits", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("first_v", LongType, nullable = false),
      StructField("last_v", LongType, nullable = false)))
    val partRows = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        val k = names.length
        val bits = new Array[Long](k)
        val first = new Array[Long](k)
        val prev = new Array[Long](k)
        var rows = 0L
        while (it.hasNext) {
          val r = it.next()
          var i = 0
          while (i < k) {
            val v = r.getLong(nSort + i)
            val d = if (rows == 0L) { first(i) = v; v } else v - prev(i)
            bits(i) += bitlen(zigzag(d))
            prev(i) = v
            i += 1
          }
          rows += 1L
        }
        (0 until k).iterator.map(i =>
          Row(pid, names(i), bits(i), rows, first(i), prev(i)))
      }
    }(org.apache.spark.sql.Encoders.row(schema)).collect()

    val totals = names.map { cn =>
      val per = partRows.filter(_.getString(1) == cn).sortBy(_.getInt(0))
      var bits = 0L; var rows = 0L
      var havePrev = false; var prevLast = 0L
      per.foreach { r =>
        bits += r.getLong(2); rows += r.getLong(3)
        if (havePrev) {
          val f = r.getLong(4)
          bits -= bitlen(zigzag(f))              // was priced as delta-from-0
          bits += bitlen(zigzag(f - prevLast))   // re-price against the seam
        }
        prevLast = r.getLong(5); havePrev = true
      }
      Row(cn, bits, rows)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(totals.toSeq, 1),
      StructType(Seq(
        StructField("col_name", StringType, nullable = false),
        StructField("delta_bits", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false))))
  }
}
