package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the last hop of a data pipeline, where a curated
  * corpus is laid out as N self-describing shards a training job streams
  * independently (the tfrecord/webdataset layout, in parquet).
  *
  * Layout decisions that matter at 100 TB:
  *  - shard assignment is a DETERMINISTIC pure function of a caller-chosen
  *    key (`pmod(key, n)`) — re-runs and backfills land every document in
  *    the same shard, so downstream sampling/resume logic stays stable.
  *    Pass a hash for content randomization or an id for range affinity.
  *  - one `repartition(n, shard)` is the only shuffle; `partitionBy` then
  *    writes each shard as its own `shard=k/` dir, so a trainer (or
  *    [[readShard]]) reading one shard scans exactly its files —
  *    directory-level pruning, no manifest lookup needed.
  *  - documents are sorted WITHIN shards by the caller's order column
  *    (e.g. a curriculum score or packed-sequence id) without any global
  *    sort barrier.
  *  - a sibling manifest parquet (one row per shard: docs, tokens, bytes) is
  *    both the integrity check (recount == manifest) and what a training
  *    launcher reads to size epochs/mixtures without touching the data.
  */
object ShardExport {

  /** Write `df` as `n` shards under `dir` and return the manifest
    * (shard, docs, tokens, bytes), which is also persisted to
    * the sibling manifest path. `shardKey` must be non-null BIGINT-castable. */
  def write(df: DataFrame, dir: String, n: Int, shardKey: Column,
      orderBy: Column, tokens: Column, bytes: Column): DataFrame = {
    require(n >= 1 && n <= 1000000, s"n=$n out of range")
    val spark = df.sparkSession
    val sharded = df
      .withColumn("shard", pmod(shardKey.cast("long"), lit(n.toLong)))
      .withColumn("__tokens", tokens.cast("long"))
      .withColumn("__bytes", bytes.cast("long"))
    sharded
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), orderBy)
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val manifest = spark.read.parquet(dir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("docs"),
        sum(col("__tokens")).as("tokens"),
        sum(col("__bytes")).as("bytes"))
    manifest.coalesce(1).write.mode("overwrite").parquet(manifestPath(dir))
    spark.read.parquet(manifestPath(dir))
  }

  /** One shard's documents — scans only `shard=k/` (directory pruning). */
  def readShard(spark: SparkSession, dir: String, shard: Int): DataFrame =
    spark.read.parquet(dir).where(col("shard") === shard)
      .drop("__tokens", "__bytes")

  /** The persisted manifest. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(manifestPath(dir))

  /** Sibling of the shard root (underscore-prefixed paths inside the root
    * are hidden from Spark listings, which is what keeps the shard read
    * clean — but also makes writes INTO them warn noisily). */
  private def manifestPath(dir: String): String =
    dir.stripSuffix("/") + "__manifest"
}
