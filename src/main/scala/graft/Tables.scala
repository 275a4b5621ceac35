package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives the scale-factor directory and
  * resolves tables through here, so filters/projections written against these
  * frames are pushed into the parquet scan by Catalyst (verify via
  * `.explain("formatted")` → `PushedFilters`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read nanos as long and truncate to a microsecond
      // TIMESTAMP (same floor DuckDB applies at epoch_ms granularity).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all tables as temp views (for `spark.sql` surfaces). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
