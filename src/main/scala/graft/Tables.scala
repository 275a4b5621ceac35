package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // events.ts has shipped as three parquet flavors across testdata
      // regenerations: TIMESTAMP(NANOS) (vectorized reader rejects it —
      // read nanos as long, truncate to micros), TIMESTAMP(MICROS)
      // isAdjustedToUTC=1 (plain LTZ), and TIMESTAMP(MICROS)
      // isAdjustedToUTC=0 (Spark 4.x infers TIMESTAMP_NTZ, which the
      // epoch functions downstream reject). Normalize all three to a
      // session-TZ TIMESTAMP here, at the single load seam: under the
      // UTC session TZ the NTZ→LTZ cast reads the stored wall-clock as
      // a UTC instant — byte-identical to how DuckDB's epoch_ms treats
      // the same column, so oracles stay exact.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all tables as temp views (for `spark.sql` surfaces). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
