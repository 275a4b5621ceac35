package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Causal readouts over observational slices — the analytics layer a
  * metrics pipeline runs AFTER the counting: "did the rollout move the
  * metric, net of the trend everyone experienced?"
  */
object Causal {

  /** Difference-in-differences (Card & Krueger 1994 canonical form): the
    * treated group's pre→post change minus the control group's,
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    *
    * under the parallel-trends assumption. Each cell mean truncates to
    * e6 BEFORE the differences (the pinned deterministic order — four
    * truncations, then pure LONG subtraction), and the four cell
    * (n, sum) sufficient statistics ride along so a consumer can redo
    * the arithmetic at any precision.
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus —
    * eight conditional sums — collapsing any input size to a single row.
    * Empty cells yield NULL means and a NULL DiD (no silent zero). */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
      outcome: Column): DataFrame = {
    val y = outcome.cast("long")
    def cell(t: Boolean, p: Boolean, what: Column): Column =
      sum(when(treated === t && post === p, what).otherwise(0L))
    def n(t: Boolean, p: Boolean): Column = cell(t, p, lit(1L))
    def s(t: Boolean, p: Boolean): Column = cell(t, p, y)
    val agg = df.agg(
      n(true, false).as("n_t_pre"), s(true, false).as("sum_t_pre"),
      n(true, true).as("n_t_post"), s(true, true).as("sum_t_post"),
      n(false, false).as("n_c_pre"), s(false, false).as("sum_c_pre"),
      n(false, true).as("n_c_post"), s(false, true).as("sum_c_post"))
    def mean(sc: String, nc: String): Column =
      when(col(nc) > 0, expr(s"$sc * 1000000 div $nc"))
    agg
      .withColumn("m_t_pre_e6", mean("sum_t_pre", "n_t_pre"))
      .withColumn("m_t_post_e6", mean("sum_t_post", "n_t_post"))
      .withColumn("m_c_pre_e6", mean("sum_c_pre", "n_c_pre"))
      .withColumn("m_c_post_e6", mean("sum_c_post", "n_c_post"))
      .withColumn("did_e6",
        (col("m_t_post_e6") - col("m_t_pre_e6")) -
          (col("m_c_post_e6") - col("m_c_pre_e6")))
  }
}
