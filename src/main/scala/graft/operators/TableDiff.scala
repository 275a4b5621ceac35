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

  /** SCD Type-2 history build — the warehouse dimension form of the
    * upsert/CDC family: fold a keyed change stream into versioned
    * validity intervals. Consecutive repeats of the SAME value collapse
    * (no phantom versions — the load-bearing SCD2 rule); each surviving
    * version is valid [its first change ts, next version's ts), the
    * open current version carrying a −1 sentinel end and is_current.
    *
    * Shape: both windows (the change filter's lag and the interval
    * lead/version number) ride ONE per-key sort — a single hash
    * exchange on the key, no self-join, no collect. Ties on the change
    * timestamp totalize through `tieCol`. */
  def scd2History(changes: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__ts"), col(tieCol))
    val versions = changes
      .select(col(keyCol), col(valueCol).as("value"),
        col(tsCol).cast("long").as("__ts"), col(tieCol))
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> col("value")))
    versions
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", coalesce(lead(col("__ts"), 1).over(w), lit(-1L)))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(keyCol), col("value"), col("valid_from"), col("valid_to"),
        col("version"), (col("valid_to") === -1L).as("is_current"))
  }

  /** Order-invariant table checksum — the O(1)-output replica/migration
    * comparator: when [[diff]]'s full-outer join is too expensive to run
    * routinely, two sides each compute (n_rows, xor_hash, sum_hash) over
    * a canonical row serialization and compare three scalars. XOR and
    * SUM are both commutative+associative, so the fingerprint is
    * independent of row order AND partitioning; keeping both closes each
    * other's blind spots (XOR misses duplicate-pair swaps, SUM misses
    * compensating edits). Row hash = the SQL-replicable poly_hash64
    * kernel (KR mod 2⁶¹−1 + splitMix64), so a DuckDB/ANSI oracle can
    * recompute the checksum bit-exactly — the point of a cross-engine
    * reconciliation tool.
    *
    * One map-side-combinable pass, three scalars out, no shuffle beyond
    * the final single-row combine. Callers pre-project the columns to
    * integer/string form (float formatting is engine-specific) and own
    * the column ORDER; NULLs serialize as `nullToken`. */
  def checksum(df: DataFrame, cols: Seq[String],
      nullToken: String = "\u0001"): DataFrame = {
    require(cols.nonEmpty)
    graft.functions.PolyHash64.register(df.sparkSession)
    val ser = concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit(nullToken))): _*)
    df.select(graft.functions.PolyHash64.polyHash64(ser).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("xor_hash"),
        coalesce(sum(col("__h").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("sum_hash"))
  }
}
