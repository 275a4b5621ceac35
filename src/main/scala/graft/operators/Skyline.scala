package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the curation trade-off query: which
  * documents are undominated when one axis is maximized (quality) and
  * the other minimized (cost/length)? A point is dominated iff some
  * other point is ≥ on the max axis, ≤ on the min axis, and strictly
  * better on at least one.
  *
  * Shape: for two integer dimensions the skyline needs NO pairwise
  * join — collapse rows to distinct (max, min) cells first (the censys
  * is bounded by the value-grid, not the row count), then two window
  * minima decide dominance: the running min of the cost axis over cells
  * with STRICTLY higher quality (an ascending RANGE frame starting
  * 1 FOLLOWING — integer axes make "strictly" a frame bound), and the
  * min within the same quality value. One shuffle to the cell census,
  * one sort over cells. At 100 TB the cell census is the map-side
  * combine; the windowed pass runs over thousands of cells, not
  * billions of rows. */
object Skyline {

  /** Frontier cells over (maximize `maxCol`, minimize `minCol`), both
    * integer-valued. Output one row per undominated cell:
    * (out columns, n_rows) sorted by `maxCol` descending — along the
    * frontier the min axis then ascends strictly. */
  def frontier2D(df: DataFrame, maxCol: Column, minCol: Column,
      outMax: String, outMin: String): DataFrame = {
    val cells = df.select(maxCol.cast("long").as("q"),
        minCol.cast("long").as("c"))
      .groupBy(col("q"), col("c")).agg(count(lit(1)).as("n_rows"))
    // min cost among cells with strictly higher quality: ascending sort,
    // frame = everything from q+1 upward
    val higher = Window.partitionBy(Census.onePartKey(col("q"))).orderBy(col("q"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val sameQ = Window.partitionBy(col("q"))
    cells
      .withColumn("min_c_higher", min(col("c")).over(higher))
      .withColumn("min_c_same", min(col("c")).over(sameQ))
      .where((col("min_c_higher").isNull || col("min_c_higher") > col("c")) &&
        col("min_c_same") === col("c"))
      .select(col("q").as(outMax), col("c").as(outMin), col("n_rows"))
  }
}
