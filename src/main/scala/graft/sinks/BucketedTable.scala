package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Bucketed table layout — the SECOND join co-location lever next to
  * [[ZOrderTable]]'s clustering: pre-hash-partition a table into N
  * buckets on its join key at WRITE time so every subsequent equi-join or
  * aggregation on that key runs with NO exchange on either side. At
  * 100 TB this converts the recurring fact⋈fact join (too big to
  * broadcast, both sides huge — e.g. lineitem⋈orders, impressions⋈
  * actions) from "shuffle both sides every query" into "pay one shuffle
  * once, at layout time"; Spark's scan reports the bucket spec as its
  * output partitioning and Catalyst drops the Exchange (pinned in
  * BucketedTableSpec).
  *
  * Uses Spark's native datasource bucketing (`bucketBy` + external-path
  * `saveAsTable`): hash(key) mod N names the file, the catalog carries
  * the spec, and `spark.table` restores it — nothing custom to maintain,
  * and bucket-pruning on point predicates comes free. `sortBy` on the
  * same key additionally lets the merge join skip its per-partition sort
  * when each bucket holds a single file.
  */
object BucketedTable {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered as `name` at `path` (dropped and replaced if present). */
  def writeBucketed(df: DataFrame, name: String, path: String, buckets: Int,
      bucketCol: String, sortCol: String): Unit = {
    require(buckets >= 1)
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCol)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Equi-join of two same-bucket-count tables on their bucket keys —
    * hinted to the merge join (the plan that is exchange-free here and
    * the only viable one when both sides are too big to broadcast). */
  def coLocatedJoin(spark: SparkSession, leftName: String, rightName: String,
      condition: Column): DataFrame =
    spark.table(leftName).hint("merge")
      .join(spark.table(rightName).hint("merge"), condition)
}
