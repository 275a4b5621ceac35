package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered table layout with file-level min/max data
  * skipping — the lakehouse scan-reduction lever (the technique behind
  * Delta OPTIMIZE ZORDER BY / Hudi clustering; Morton 1966).
  *
  * Why it matters at 100 TB: partition pruning only cuts the partition
  * dimension. A multi-dimensional predicate (user × time, content ×
  * geography) over a table laid out by ONE key still scans every file for
  * the other key. Interleaving the key bits (Morton code) makes files
  * rectangular in key-space, so per-file min/max statistics prune on EVERY
  * indexed dimension at once.
  *
  * Shape:
  *  - `write`: quantize each clustering column to `bits` bits of its
  *    [min,max] range (one bounded stats aggregate — a 1-row driver
  *    action), interleave into the z-value, bucket equi-width on the z
  *    domain (no global sort, no sampled range partitioner — deterministic
  *    and shuffle-free beyond the partitioned write), write
  *    `partitionBy(zbucket)` plus a per-bucket min/max manifest.
  *  - `read`: prune buckets whose [min,max] boxes miss the predicate
  *    rectangle, then scan only surviving bucket directories (the bucket
  *    filter lands in the scan's PartitionFilters, so pruning is
  *    directory-level, not row-level) and re-apply the exact predicate.
  *
  * Equi-width buckets trade balance for determinism: a skewed z domain
  * yields uneven files, but pruning stays CORRECT (the manifest records
  * actual per-bucket extents), and no sampling pass is needed. Production
  * layouts re-cluster periodically; this is the one-shot form.
  */
object ZOrderTable {

  /** Morton-interleaves `cols` (each already quantized to `bits`
    * non-negative bits) — bit i of column j lands at position i·k + j. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Quantizes a long column's [lo,hi] range onto [0, 2^bits). A constant
    * column (hi == lo) maps to 0. The scaling runs in DOUBLE from the
    * first operation — `(c-lo)*mask` in long arithmetic would wrap
    * negative for ranges past ~2^47 and silently collapse the upper range
    * onto quantum 0 — so wide domains lose only sub-quantum PRECISION
    * (past 2^53 the last few steps blur): bucket locality degrades
    * marginally, while pruning stays exact because the manifest records
    * actual per-bucket extents and the read re-applies the precise
    * predicate. The clamp pins the codomain. */
  def quantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val mask = (1L << bits) - 1
    if (hi == lo) lit(0L)
    else least(lit(mask), greatest(lit(0L),
      ((c - lit(lo)).cast("double") * lit(mask.toDouble) / lit((hi - lo).toDouble))
        .cast("long")))
  }

  /** Writes `df` z-ordered by `zCols` (long-valued columns) into
    * `buckets` bucket directories under `dir`, with a per-bucket min/max
    * manifest for read-side skipping.
    *
    * `bloomCols` (long-valued) additionally store a per-bucket
    * [[graft.agg.BloomSketch]] bitset in the manifest — the skipping
    * index for EQUALITY predicates on columns the Morton order does NOT
    * cluster: a point lookup on a scattered secondary key defeats
    * min/max (every bucket's range covers everything) but a Bloom probe
    * prunes to the buckets that genuinely hold the key, false positives
    * only ever costing an extra scan, never a missed row. This mirrors
    * Parquet's own column-index blooms one level up, where whole bucket
    * DIRECTORIES are skipped before any footer is opened. */
  def write(df: DataFrame, dir: String, zCols: Seq[String], buckets: Int,
      bits: Int = 16, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 16, bloomHashes: Int = 5): Unit = {
    require(zCols.nonEmpty && buckets > 0)
    if (bloomCols.nonEmpty) graft.agg.BloomSketch.register(df.sparkSession)
    val zDomainBits = bits * zCols.size
    require(zDomainBits + 64 - java.lang.Long.numberOfLeadingZeros(buckets.toLong) < 63,
      s"bits=$bits × ${zCols.size} cols with $buckets buckets overflows a long")
    // ONE source pass feeds the extents collect, the data write and the
    // manifest aggregate (write() is eager, so the unpersist is safe)
    val src = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded driver action: ONE row of per-column extents
      val stats = src.select(zCols.flatMap(c =>
        Seq(min(col(c)).cast("long").as(s"lo_$c"),
          max(col(c)).cast("long").as(s"hi_$c"))): _*).collect()(0)
      val aggs = zCols.flatMap(c => Seq(min(col(c)).cast("long").as(s"lo_$c"),
        max(col(c)).cast("long").as(s"hi_$c"))) ++
        bloomCols.map(c => graft.agg.BloomSketch
          .bloomBits(col(c), bloomBits, bloomHashes).as(s"bloom_$c"))
      if (stats.isNullAt(0)) {
        // empty input: a partitioned write would emit NO files (schema
        // inference on read then fails) — write unpartitioned so the
        // empty table keeps its schema, plus an empty readable manifest
        src.withColumn("zbucket", lit(0L))
          .write.mode("overwrite").parquet(dir)
        src.withColumn("zbucket", lit(0L)).groupBy(col("zbucket"))
          .agg(aggs.head, aggs.tail: _*).where(lit(false))
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/_zmanifest")
        return
      }
      val ext = zCols.zipWithIndex.map { case (c, i) =>
        c -> ((stats.getLong(2 * i), stats.getLong(2 * i + 1)))
      }.toMap
      val q = zCols.map(c => quantize(col(c), ext(c)._1, ext(c)._2, bits))
      val z = interleave(q, bits)
      val bucketed = src.withColumn("zbucket",
        (z * lit(buckets.toLong) / lit(1L << zDomainBits)).cast("long"))
      bucketed.write.mode("overwrite").partitionBy("zbucket").parquet(dir)
      bucketed.groupBy(col("zbucket")).agg(aggs.head, aggs.tail: _*)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_zmanifest")
    } finally { src.unpersist(); () }
  }

  /** Buckets whose min/max box intersects every predicate interval.
    * `preds`: col → (lo, hi), both inclusive. */
  def selectBuckets(spark: SparkSession, dir: String,
      preds: Map[String, (Long, Long)]): Seq[Long] = {
    val m = spark.read.parquet(s"$dir/_zmanifest")
    val cond = preds.map { case (c, (lo, hi)) =>
      col(s"lo_$c") <= lit(hi) && col(s"hi_$c") >= lit(lo)
    }.reduce(_ && _)
    m.where(cond).select("zbucket").collect().map(_.getLong(0)).toSeq
  }

  /** Data-skipping read: scans only the buckets `selectBuckets` keeps
    * (directory-level pruning via the partition column) and re-applies the
    * exact predicate. */
  def read(spark: SparkSession, dir: String,
      preds: Map[String, (Long, Long)]): DataFrame = {
    val keep = selectBuckets(spark, dir, preds)
    val exact = preds.map { case (c, (lo, hi)) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    spark.read.parquet(dir)
      .where(col("zbucket").isin(keep: _*))
      .where(exact)
      .drop("zbucket")
  }

  /** Buckets surviving BOTH the min/max boxes (`rangePreds`, may be
    * empty) and a Bloom membership probe for every equality predicate
    * (cols must have been in `write`'s `bloomCols`). The probe runs
    * driver-side over the collected manifest — the same bounded action
    * `selectBuckets` already performs (one row per bucket). */
  def selectBucketsEq(spark: SparkSession, dir: String,
      rangePreds: Map[String, (Long, Long)],
      eqPreds: Map[String, Long]): Seq[Long] = {
    require(eqPreds.nonEmpty)
    val eqCols = eqPreds.keys.toSeq
    val m = spark.read.parquet(s"$dir/_zmanifest")
    val rangeCond = rangePreds.map { case (c, (lo, hi)) =>
      col(s"lo_$c") <= lit(hi) && col(s"hi_$c") >= lit(lo)
    }.reduceOption(_ && _).getOrElse(lit(true))
    m.where(rangeCond)
      .select(col("zbucket") +: eqCols.map(c => col(s"bloom_$c")): _*)
      .collect()
      .filter(r => eqCols.zipWithIndex.forall { case (c, i) =>
        graft.agg.BloomSketch.mightContain(
          r.getAs[Array[Byte]](i + 1), eqPreds(c))
      })
      .map(_.getLong(0)).toSeq
  }

  /** Point-lookup read: Bloom-prunes bucket directories on the equality
    * predicates (plus optional min/max boxes), then scans survivors and
    * re-applies the exact predicates — false positives cost a scan,
    * never a wrong row. */
  def readEq(spark: SparkSession, dir: String,
      rangePreds: Map[String, (Long, Long)],
      eqPreds: Map[String, Long]): DataFrame = {
    val keep = selectBucketsEq(spark, dir, rangePreds, eqPreds)
    val exact = (rangePreds.map { case (c, (lo, hi)) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    } ++ eqPreds.map { case (c, v) => col(c) === lit(v) })
      .reduce(_ && _)
    spark.read.parquet(dir)
      .where(col("zbucket").isin(keep: _*))
      .where(exact)
      .drop("zbucket")
  }
}
