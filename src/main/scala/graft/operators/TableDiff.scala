package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — classify every key as insert / delete / update
  * between two versions of a table (the reconciliation pass behind CDC
  * backfills, [[graft.sinks.UpsertTable]] audit checks, and "what changed
  * since yesterday's drop" questions).
  *
  * Shape: ONE full-outer shuffle on the key; non-key columns ride as a
  * single struct per side and compare with null-safe equality (`<=>`), so
  * NULL-valued columns diff correctly and the comparison is one codegen'd
  * struct equality, not |cols| predicates. Unchanged keys drop before
  * anything downstream sees them. Pre-bucketing both snapshots on the key
  * ([[graft.sinks.BucketedTable]]) makes the diff exchange-free.
  *
  * Requires both frames to share the full column set (the usual two
  * snapshots of one table); key columns must be non-null on every row of
  * both sides. */
object TableDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshots must share one schema")
    val nonKey = oldDf.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, side: String) = df.select(
      keys.map(col) :+ struct(nonKey.map(col): _*).as(side): _*)
    pack(oldDf, "__o").join(pack(newDf, "__n"), keys, "full_outer")
      .withColumn("change_type",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(!(col("__o") <=> col("__n")), "update"))
      .where(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}
