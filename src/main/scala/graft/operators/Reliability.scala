package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cronbach's alpha internal-consistency coefficient (Cronbach 1951) —
  * the eval-harness reliability readout: k "items" (rubric criteria,
  * judge prompts, heuristic quality scores) score the same units; do
  * they measure one underlying construct, or is the composite score
  * noise? Sits beside the agreement family (q249 κ, q338 α, q363
  * pairwise κ), which asks "do RATERS agree on a label" — alpha asks
  * "do ITEMS cohere as a scale".
  *
  *   α = k/(k−1) · (1 − Σⱼ σ²ⱼ / σ²_total)
  *
  * computed from cleared-denominator exact variance numerators
  * (n·Σx² − S² — the q376 identity; the n² denominators cancel in the
  * ratio):
  *
  *   ratio_e6 = (Σⱼ (n·Qⱼ − Sⱼ²))·1e6 div (n·Q_t − S_t²)
  *   alpha_e6 = k·(1e6 − ratio_e6) div (k−1)
  *
  * — two truncating divisions in that pinned order, everything else
  * DECIMAL(38,0)-exact. NULL alpha when the composite has zero
  * variance (the scale is degenerate; any α would be a lie).
  *
  * Scale shape: ONE map-side-combined aggregate over unit rows
  * carrying 2k+3 sums; scalar arithmetic on the group census after.
  */
object Reliability {

  def cronbachAlphaE6(df: DataFrame, groupCols: Seq[String],
      items: Seq[Column]): DataFrame = {
    val k = items.size
    require(k >= 2, s"Reliability.cronbachAlphaE6: need ≥ 2 items, got $k")
    val named = items.zipWithIndex.map { case (c, i) =>
      c.cast("long").as(s"__x$i") }
    val base = df.select(groupCols.map(col) ++ named: _*)
      .withColumn("__t",
        expr((0 until k).map(i => s"__x$i").mkString(" + ")))
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      (0 until k).flatMap(i => Seq(
        sum(col(s"__x$i")).as(s"s$i"),
        sum(expr(s"CAST(__x$i AS DECIMAL(38,0)) * __x$i")).as(s"q$i"))) ++
      Seq(sum(col("__t")).as("st"),
        sum(expr("CAST(__t AS DECIMAL(38,0)) * __t")).as("qt"))
    val stats = base.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val itemVarNum = (0 until k)
      .map(i => s"(n * q$i - CAST(s$i AS DECIMAL(38,0)) * s$i)")
      .mkString(" + ")
    stats
      .withColumn("__vt", expr("n * qt - CAST(st AS DECIMAL(38,0)) * st"))
      .withColumn("ratio_e6",
        when(col("__vt") > 0L,
          expr(s"CAST(($itemVarNum) * 1000000 div __vt AS BIGINT)")))
      .withColumn("alpha_e6",
        when(col("ratio_e6").isNotNull,
          expr(s"${k}L * (1000000 - ratio_e6) div ${k - 1}L")))
      .select(groupCols.map(col) :+ col("n") :+ lit(k.toLong).as("k") :+
        col("ratio_e6") :+ col("alpha_e6"): _*)
  }
}
