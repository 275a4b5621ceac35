package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J7/J8/D3 batch forms.
  *
  *  - `sessionCogroup`: full-outer cogroup of two tagged streams per key
  *    within event-time sessions (reference FlatResponseInsertion cogroup,
  *    P:job/join/FlatOutputJob.java:998-1044 — impressions+actions per
  *    insertion in 1-day-gap session windows).
  *  - `attachLatest`: up to K most recent prior right-side events attached
  *    to each left event within a lookback window (reference
  *    AddLatestImpressions, P:common/functions/AddLatestImpressions
  *    .java:45-386 — ≤25 impressions, 6h session).
  *  - `redundantRepoint`: collapse repeated right-side events per
  *    (key, content) onto the first ("canonical") and re-point referencing
  *    rows (reference ReduceRedundantTinyImpressions,
  *    P:common/functions/redundantimpression/ReduceRedundantTinyImpressions
  *    .java:38-249).
  */
object Cogroup {

  /** Tag + union + sessionize + pivot counts: one pass, one shuffle.
    * Output: keys, session_start_ms, n_left, n_right. */
  def sessionCogroup(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsMs: String, gapMs: Long, leftTie: String, rightTie: String): DataFrame = {
    val l = left.select((keys.map(col) :+ col(tsMs) :+
      col(leftTie).cast("long").as("__tie") :+ lit(1).as("__isLeft")): _*)
    val r = right.select((keys.map(col) :+ col(tsMs) :+
      col(rightTie).cast("long").as("__tie") :+ lit(0).as("__isLeft")): _*)
    Sessionize.assignSessions(l.unionByName(r), keys, tsMs, gapMs, "__tie")
      .groupBy((keys.map(col) :+ col("__session")): _*)
      .agg(min(col(tsMs)).as("session_start_ms"),
        sum(col("__isLeft")).cast("long").as("n_left"),
        (count(lit(1)) - sum(col("__isLeft"))).cast("long").as("n_right"))
      .drop("__session")
  }

  /** For each left row, the K most recent right rows with
    * rightTs <= leftTs (strictly within lookbackMs), exploded as
    * (left cols, rank, right id/ts). One equi+range join, one window. */
  def attachLatest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsMs: String, rightTsMs: String, leftId: String, rightId: String,
      k: Int, lookbackMs: Long): DataFrame = {
    val l = left.as("l"); val r = right.as("r")
    val keyCond = keys.map(c => col(s"l.$c") === col(s"r.$c")).reduce(_ && _)
    val range = col(s"r.$rightTsMs") <= col(s"l.$leftTsMs") &&
      col(s"r.$rightTsMs") >= col(s"l.$leftTsMs") - lookbackMs
    val w = Window.partitionBy(col(s"l.$leftId"))
      .orderBy(col(s"r.$rightTsMs").desc, col(s"r.$rightId").desc)
    l.join(r, keyCond && range, "inner")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select((keys.map(c => col(s"l.$c").as(c)) :+
        col(s"l.$leftId").as(leftId) :+ col(s"l.$leftTsMs").as(leftTsMs) :+
        col("rank") :+ col(s"r.$rightId").as(rightId) :+
        col(s"r.$rightTsMs").as(rightTsMs)): _*)
  }

  /** Canonicalization map: every event re-points to the first event of its
    * (keys) group by (ts, id). Output = input cols + canonical_id. */
  def redundantRepoint(events: DataFrame, keys: Seq[String], id: String,
      tsMs: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMs), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("canonical_id", first(col(id)).over(w))
  }
}
