package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-attribute join (reference J10 UserJoin + UserUpdateMerger,
  * P:common/functions/userjoin/UserJoin.java:62-358): partial user-record
  * updates merge per key (latest non-empty field wins), and events join
  * the merged user state as of their timestamp.
  *
  * Streaming form = `TemporalJoin.joinStream` fed with merged snapshots
  * from `mergedUpdates`; batch form composes `mergedUpdates` with
  * `operators.AsOfJoin`.
  */
object UserJoin {

  /** Per-key running merge of partial updates: each update row becomes the
    * merged snapshot at its timestamp — for every attribute column, the
    * latest non-empty value at-or-before that row. One window pass. */
  def mergedUpdates(updates: DataFrame, keys: Seq[String], tsMs: String,
      tieBreak: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMs), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    attrCols.foldLeft(updates) { (df, c) =>
      df.withColumn(c,
        last(when(col(c) =!= "", col(c)), ignoreNulls = true).over(w))
    }
  }
}
