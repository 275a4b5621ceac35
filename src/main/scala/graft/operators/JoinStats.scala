package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight equi-join cardinality and skew estimation — the planning
  * pass a 100 TB pipeline runs BEFORE committing to a join strategy. The
  * exact output size of an equi-join is Σ_key n_left(key)·n_right(key);
  * computing it costs two aggregations over single columns (map-side
  * partial combines, one narrow shuffle of per-key counts each) plus a
  * join of the two count frames — orders of magnitude cheaper than the
  * join it predicts, and the inputs it needs (per-key counts) are exactly
  * what decides broadcast-vs-shuffle, salting factor, and AQE skew-split
  * thresholds.
  *
  * This is the operator form of what engines keep in catalog statistics
  * (most-common-value lists, join selectivity); running it as a query
  * step gives the numbers for THIS join's key distribution, not a stale
  * table-level histogram.
  */
object JoinStats {

  /** Per-key join-size decomposition for `left ⋈ right` on
    * `leftKey = rightKey`: the `topK` keys by output-row contribution
    * (ties to the smaller key), each with its per-side multiplicities,
    * contribution `rows = nl·nr`, and the share of the TOTAL join output
    * it represents in exact parts-per-million (integer floor division —
    * deterministic, no float drift).
    *
    * A key carrying a large `share_ppm` is the skew diagnosis: it tells
    * you the join's biggest reducer BEFORE the shuffle exists, and
    * nl/nr tell you which side to salt or broadcast. Self-join sizing
    * (pair mining, similarity blocking) is the same call with
    * `left eq right`. Output: (key, nl, nr, rows, share_ppm). */
  def joinSizeByKey(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be >= 1")
    val l = left.select(leftKey.cast("long").as("key"))
      .where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("nl"))
    val r = right.select(rightKey.cast("long").as("key"))
      .where(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("nr"))
    // inner join of the count frames: keys absent from either side
    // contribute zero rows and drop out, exactly like the join itself
    val contrib = l.join(r, "key")
      .select(col("key"), col("nl"), col("nr"),
        (col("nl") * col("nr")).as("rows"))
    val total = contrib.agg(sum(col("rows"))).head().getLong(0)
    contrib
      .orderBy(col("rows").desc, col("key"))
      .limit(topK)
      .withColumn("share_ppm", expr(s"rows * 1000000 div $total"))
      .select(col("key"), col("nl"), col("nr"), col("rows"), col("share_ppm"))
  }
}
