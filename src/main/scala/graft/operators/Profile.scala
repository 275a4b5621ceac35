package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling (the Deequ/Great-Expectations shape): per-column
  * row/null/distinct counts and min/max over an arbitrary column list,
  * computed in a SINGLE scan — the pre-ingest census every pipeline runs
  * before trusting a new drop of data.
  *
  * Shape: all per-column aggregates ride one `agg` (Catalyst plans the
  * multi-`countDistinct` via Expand — k× rows through ONE scan, partial
  * aggregation below the exchange, no per-column re-reads), producing a
  * single row that unpivots into (column, stats) rows with a literal
  * `stack`. At 100 TB this is one pass over the table versus the naive
  * k-scan loop.
  *
  * min/max are rendered as strings so heterogeneous column types share a
  * schema; longs and strings render identically across engines (doubles
  * and timestamps have engine-specific text forms — callers gating
  * cross-engine should profile integral/text columns, as q79 does).
  */
object Profile {

  /** Per-column stats rows: (column, n_rows, n_null, n_distinct,
    * min_value, max_value) in `cols` order. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        // sum over ZERO rows is NULL, not 0 — coalesce so an empty
        // table profiles as all-zero counts
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `null_$c`, `dist_$c`, `min_$c`, `max_$c`"
    ).mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_null, n_distinct, min_value, max_value)"))
      .select(col("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Declarative data-quality checks (the Deequ constraint suite shape):
    * each check reduces to ONE aggregate-able violation count, evaluated
    * in a single pass per source frame, emitted as
    * (check_name, violations, passed) rows — the contract gate a pipeline
    * runs before publishing a snapshot.
    *
    *  - `completeness`: null count of a column must be 0;
    *  - `uniqueness`: duplicate-key rows (n − distinct) must be 0;
    *  - `referential`: child keys absent from the parent must be 0 —
    *    a left-anti join, which Catalyst runs broadcast when the parent
    *    key set is small and shuffled otherwise.
    *
    * All violation counts are exact longs; `passed` is their == 0. */
  def checks(df: DataFrame,
      completeness: Seq[String] = Nil,
      uniqueness: Seq[String] = Nil,
      referential: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    require(completeness.nonEmpty || uniqueness.nonEmpty || referential.nonEmpty)
    val inlineDefs: Seq[(String, org.apache.spark.sql.Column)] =
      completeness.map(c => s"complete:$c" ->
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))) ++
      uniqueness.map(c => s"unique:$c" ->
        (count(col(c)) - countDistinct(col(c))))
    val inline: Seq[DataFrame] =
      if (inlineDefs.isEmpty) Nil
      else {
        // one scan for every inline check; stack unpivots the single row
        val aggs = inlineDefs.zipWithIndex.map { case ((_, c), i) => c.as(s"v$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = inlineDefs.zipWithIndex
          .map { case ((n, _), i) => s"'$n', v$i" }.mkString(", ")
        Seq(one.select(expr(
          s"stack(${inlineDefs.size}, $stackArgs) AS (check_name, violations)")))
      }
    val refs = referential.map { case (childKey, parent, parentKey) =>
      df.select(col(childKey)).where(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)),
          Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"ref:$childKey->$parentKey").as("check_name"),
          col("violations"))
    }
    (inline ++ refs).reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
  }
}
