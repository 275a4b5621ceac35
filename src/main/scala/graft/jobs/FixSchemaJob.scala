package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution rewrite job (reference FixSchemaJob,
  * P:job/fixschema/FixSchemaJob.java:51-93 + DateFilePathFilter): batch-read
  * date-partitioned archives, apply a declarative column mapping (add with
  * default / rename / cast / drop), and rewrite in place-shape — the
  * offline path for evolving at-rest tables the streaming jobs produced.
  *
  * Scale: dt/hour partition pruning bounds each run to the requested date
  * range (PlanSpec-style PartitionFilters); the rewrite is a pure scan →
  * project → write with no shuffle.
  */
object FixSchemaJob {

  sealed trait Fix
  case class AddColumn(name: String, default: Column) extends Fix
  case class RenameColumn(from: String, to: String) extends Fix
  case class CastColumn(name: String, to: String) extends Fix
  case class DropColumn(name: String) extends Fix

  def applyFixes(df: DataFrame, fixes: Seq[Fix]): DataFrame =
    fixes.foldLeft(df) {
      case (d, AddColumn(n, default)) =>
        if (d.columns.contains(n)) d else d.withColumn(n, default)
      case (d, RenameColumn(f, t)) => d.withColumnRenamed(f, t)
      case (d, CastColumn(n, to)) => d.withColumn(n, col(n).cast(to))
      case (d, DropColumn(n)) => d.drop(n)
    }

  /** Rewrite `inPath` (dt-partitioned parquet) into `outPath` for the given
    * dt range, with the fixes applied. */
  def run(spark: SparkSession, inPath: String, outPath: String,
      fixes: Seq[Fix], dtFrom: String, dtTo: String): Unit = {
    val src = spark.read.parquet(inPath)
      .where(col("dt") >= dtFrom && col("dt") <= dtTo)
    applyFixes(src, fixes)
      .write.mode("overwrite").partitionBy("dt").parquet(outPath)
  }
}
