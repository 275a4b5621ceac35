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
}
