package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** K4: primary-key upsert into a partitioned table with read-back
  * consistency — a merge-on-read emulation of the reference's Hudi sink
  * (HudiOutput.java:367-447: MERGE_ON_READ table type, pk + precombine
  * fields, dt/hr partition path, compaction every N delta commits;
  * wired for joined_impression / joined_action / flat_response_insertion
  * at FlatOutputJob.java:1205-1229) over plain parquet + Spark.
  *
  * Layout:
  * {{{
  *   <path>/_schema.json            record schema incl. partition cols
  *   <path>/base/<part dirs>/       compacted base files (RO view)
  *   <path>/delta/c<seq 9 digits>/<part dirs>/   one dir per upsert commit
  * }}}
  *
  * Semantics (matching Hudi's defaults as the reference configures them):
  *  - each [[upsert]] is an append-only delta commit — no base rewrite on
  *    the write path, which is what makes a streaming upsert sink cheap;
  *  - the snapshot view resolves the latest row per key by
  *    (precombine DESC, commit seq DESC) — later commit wins ties;
  *  - resolution scopes to (partition, key) — Hudi's non-global index, as
  *    the reference runs it: a key re-appearing under a new dt/hr is a new
  *    row, and no cross-partition shuffle is ever needed;
  *  - an optional boolean delete column (Hudi's `_hoodie_is_deleted`)
  *    drops the key when the latest version has it set; a later upsert
  *    resurrects it;
  *  - [[compact]] folds deltas into the base, rewriting ONLY partitions
  *    the deltas touched (dynamic partition overwrite — at 100 TB a day's
  *    deltas touch a handful of dt/hr dirs, not the table's history).
  *
  * Single-writer, like the reference's one Flink job per table (Hudi
  * serializes writers through its timeline lock). Readers are safe
  * against a concurrent upsert: commits are listed once per read and a
  * half-written commit dir is never the max listed.
  */
class UpsertTable(path: String, keyCols: Seq[String], precombineCol: String,
    partitionCols: Seq[String], deleteCol: Option[String] = None)
    extends Serializable {
  require(keyCols.nonEmpty, "keyCols must be non-empty")

  private val CommitCol = "__commit"
  private def basePath = s"$path/base"
  private def deltaPath = s"$path/delta"
  private def schemaPath = s"$path/_schema.json"

  private def fs(spark: SparkSession) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stored record schema (incl. partition cols + commit col), written at
    * the first upsert. Supplying it to every read keeps partition-column
    * TYPES stable — directory-value inference would e.g. turn a
    * "dt=2024-01-01" string column into a date. */
  private def recordedSchema(spark: SparkSession): StructType = {
    val f = fs(spark)
    val in = f.open(new Path(schemaPath))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    DataType.fromJson(json).asInstanceOf[StructType]
  }

  private def writeSchemaIfAbsent(spark: SparkSession, df: DataFrame): Unit = {
    val f = fs(spark)
    val p = new Path(schemaPath)
    if (!f.exists(p)) {
      val out = f.create(p, true)
      try out.write(df.schema.json.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Committed delta sequence numbers, ascending. */
  def commits(spark: SparkSession): Seq[Long] = {
    val f = fs(spark)
    val d = new Path(deltaPath)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.matches("c\\d{9}")).map(_.drop(1).toLong).sorted
  }

  /** Append one upsert commit. `df` must carry key, precombine and
    * partition columns; schema must match the first commit's. Returns the
    * commit sequence number. */
  def upsert(df: DataFrame): Long = {
    val spark = df.sparkSession
    require(df.columns.contains(precombineCol),
      s"missing precombine column $precombineCol")
    (keyCols ++ partitionCols).foreach(c =>
      require(df.columns.contains(c), s"missing column $c"))
    val seq = commits(spark).lastOption.getOrElse(0L) + 1L
    writeSchemaIfAbsent(spark, df.withColumn(CommitCol, lit(seq).cast(LongType)))
    val w = df.withColumn(CommitCol, lit(seq).cast(LongType))
      .write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(f"$deltaPath/c$seq%09d")
    seq
  }

  private def readDir(spark: SparkSession, dir: String): Option[DataFrame] = {
    val f = fs(spark)
    if (!f.exists(new Path(dir))) None
    else Some(spark.read.schema(recordedSchema(spark))
      .option("basePath", dir).parquet(dir))
  }

  /** Latest-per-key resolution over any mix of base + delta rows. Keeps
    * delete-flagged winners when `keepDeletes` (compaction needs them
    * gone, parity checks sometimes want them visible). */
  private def resolve(all: DataFrame, keepDeletes: Boolean): DataFrame = {
    val w = Window
      .partitionBy((partitionCols ++ keyCols).map(col): _*)
      .orderBy(col(precombineCol).desc, col(CommitCol).desc)
    val latest = all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    deleteCol match {
      case Some(d) if !keepDeletes => latest.where(!coalesce(col(d), lit(false)))
      case _ => latest
    }
  }

  /** Snapshot view (Hudi `_rt`): base merged with all deltas, latest
    * version per (partition, key), deletes applied. One shuffle on
    * (partition, key); the base side prunes to partitions the read
    * filters to, like any parquet scan. */
  def snapshot(spark: SparkSession): DataFrame = {
    val parts = readDir(spark, basePath).toSeq ++
      commits(spark).map(s => readDir(spark, f"$deltaPath/c$s%09d").get)
    require(parts.nonEmpty, s"empty upsert table at $path")
    resolve(parts.reduce(_ unionByName _), keepDeletes = false).drop(CommitCol)
  }

  /** Read-optimized view (Hudi `_ro`): base files only — no merge cost,
    * data as of the last compaction. */
  def readOptimized(spark: SparkSession): DataFrame = {
    val base = readDir(spark, basePath)
    require(base.nonEmpty, s"no base files at $path — run compact() first")
    base.get.drop(CommitCol)
  }

  /** Fold all delta commits into the base (Hudi compaction; the reference
    * schedules it NUM_OR_TIME every 600 s / N delta commits,
    * HudiOutput.java:441-442). Reads ONLY the partitions the deltas
    * touched, merges them with the matching base partitions, and
    * dynamically overwrites just those — untouched base partitions keep
    * their files byte-for-byte. Delete-flagged winners drop out of the
    * base entirely. */
  def compact(spark: SparkSession): Unit = {
    val seqs = commits(spark)
    if (seqs.isEmpty) return
    val deltas = seqs.map(s => readDir(spark, f"$deltaPath/c$s%09d").get)
      .reduce(_ unionByName _)
    val merged = readDir(spark, basePath) match {
      case Some(base) if partitionCols.nonEmpty =>
        // prune the base scan to touched partitions: collect the (small)
        // distinct partition-value set and push it down as an IN filter
        val touched = deltas.select(partitionCols.map(col): _*).distinct().collect()
        val cond = touched.map(r => partitionCols.zipWithIndex.map {
          case (c, i) => col(c) <=> lit(r.get(i))
        }.reduce(_ && _)).reduceOption(_ || _).getOrElse(lit(false))
        base.where(cond).unionByName(deltas)
      case Some(base) => base.unionByName(deltas)
      case None => deltas
    }
    val resolved = resolve(merged, keepDeletes = false)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val w = resolved.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(basePath)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val f = fs(spark)
    seqs.foreach(s => f.delete(new Path(f"$deltaPath/c$s%09d"), true))
  }

  /** Streaming upsert sink: each micro-batch is one delta commit, with
    * inline compaction every `compactEveryCommits` (the reference's
    * COMPACTION_DELTA_COMMITS trigger). Commit seqs advance per batch, so
    * a replayed batch after a failure re-runs as a LATER commit with the
    * same precombine values — latest-version resolution makes the replay
    * idempotent for readers, like Hudi's upsert path. */
  def streamUpsert(df: DataFrame, checkpoint: String,
      compactEveryCommits: Int = 5): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seq = upsert(batch)
        if (compactEveryCommits > 0 && seq % compactEveryCommits == 0)
          compact(batch.sparkSession)
      }
}
