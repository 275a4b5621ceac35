package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time session windows with a max-gap, batch form.
  *
  * Semantics of the reference's FlatResponseInsertion cogroup collected in
  * an event-time session window with a 1-day gap (P:job/join/FlatOutputJob
  * .java:998-1044, EventTimeSessionWindows.withGap). Streaming mode maps to
  * Spark's native `session_window`; the batch analogue here is the
  * gaps-and-islands pattern: one shuffle on the keys, one sort, two window
  * passes that Catalyst executes over a single Sort node.
  *
  * Scale: per-key state is O(1) during the scan (lag + running sum); skewed
  * keys stream. No collect_list materialization unless the caller asks.
  */
object Sessionize {

  /** Adds `__session` (1-based per-key session index) to `df`.
    * @param tsMs epoch-millis long column
    * @param tieBreak unique column making the in-key order total */
  def assignSessions(df: DataFrame, keys: Seq[String], tsMs: String,
      gapMs: Long, tieBreak: String): DataFrame = {
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMs), col(tieBreak))
    val prev = lag(col(tsMs), 1).over(order)
    val isNew = when(prev.isNull || col(tsMs) - prev > gapMs, 1).otherwise(0)
    df.withColumn("__new", isNew)
      .withColumn("__session",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Collapse to one row per session: start/end millis + event count. */
  def sessionBounds(df: DataFrame, keys: Seq[String], tsMs: String,
      gapMs: Long, tieBreak: String): DataFrame =
    assignSessions(df, keys, tsMs, gapMs, tieBreak)
      .groupBy((keys :+ "__session").map(col): _*)
      .agg(
        min(col(tsMs)).as("session_start_ms"),
        max(col(tsMs)).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .drop("__session")
}
