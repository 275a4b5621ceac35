package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Energy distance between two one-dimensional samples (Székely &
  * Rizzo 2004) — the two-sample test that sees EVERYTHING (location,
  * scale, shape), where KS (q107) maxes one CDF gap and PSI (q110)
  * needs binning:
  *
  *   D² = 2·E|X−Y| − E|X−X′| − E|Y−Y′|
  *
  * (V-statistic form, self-pairs included — the standard biased
  * estimator; documented, and both engines compute the same one).
  * D² = 0 iff the distributions coincide.
  *
  * The classic O(n²) pairwise |x−y| collapses by the sorted-census
  * prefix trick: for integer values on a BOUNDED grid (the caller
  * buckets, e.g. cents→dollars — censuses must be domain-grain), with
  * per-value counts na/nb and ascending prefix sums,
  *
  *   Σ_pairs |v−u| = Σ_v na(v)·( v·cntB≤(v) − sumB≤(v)
  *                             + sumB>(v) − v·cntB>(v) )
  *
  * — ONE pass over the merged value census per statistic, exact in
  * DECIMAL(38,0). Expectations truncate at e6:
  * e_cross_e6 = cross_num·1e6 div (na·nb), within likewise, and
  * energy_e6 = 2·e_cross − e_within_a − e_within_b (pinned
  * per-term truncation, so the result can sit ±2 ulp from the
  * rational value; both engines agree bit-for-bit).
  *
  * Scale shape: one hash aggregate from row grain to the merged value
  * census, three cumulative windows over that census (unpartitioned —
  * guarded by [[Census.guardLong]] under the bounded-domain contract),
  * one single-row reduction. Nothing sorts raw data.
  */
object EnergyDistance {

  /** `value` must be integral and domain-bounded (bucket first). */
  def energyE6(df: DataFrame, value: Column, inB: Column): DataFrame = {
    val census = df.select(value.cast("long").as("v"),
        inB.cast("boolean").as("b"))
      .where(col("v").isNotNull && col("b").isNotNull)
      .groupBy(col("v"))
      .agg(sum(when(!col("b"), 1L).otherwise(0L)).as("na"),
        sum(when(col("b"), 1L).otherwise(0L)).as("nb"))
    val wLe = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = census
      .withColumn("cntA_le", Census.guardLong(sum(col("na")).over(wLe),
        count(lit(1)).over(whole), "EnergyDistance.energyE6"))
      .withColumn("cntB_le", sum(col("nb")).over(wLe))
      .withColumn("sumA_le",
        sum(expr("CAST(na AS DECIMAL(38,0)) * v")).over(wLe))
      .withColumn("sumB_le",
        sum(expr("CAST(nb AS DECIMAL(38,0)) * v")).over(wLe))
      .withColumn("cntA", sum(col("na")).over(whole))
      .withColumn("cntB", sum(col("nb")).over(whole))
      .withColumn("sumA",
        sum(expr("CAST(na AS DECIMAL(38,0)) * v")).over(whole))
      .withColumn("sumB",
        sum(expr("CAST(nb AS DECIMAL(38,0)) * v")).over(whole))
    // Σ na(v)·( v·cntX≤ − sumX≤ + (sumX − sumX≤) − v·(cntX − cntX≤) )
    def pairNum(src: String, other: String): Column = sum(expr(
      s"""CAST(n$src AS DECIMAL(38,0)) * (
         |  CAST(v AS DECIMAL(38,0)) * cnt${other}_le - sum${other}_le
         |  + (sum$other - sum${other}_le)
         |  - CAST(v AS DECIMAL(38,0)) * (cnt$other - cnt${other}_le))"""
        .stripMargin))
    val agg = cum.agg(
      max(col("cntA")).as("na"), max(col("cntB")).as("nb"),
      pairNum("a", "A").as("wa_num"),
      pairNum("b", "B").as("wb_num"),
      pairNum("a", "B").as("cross_num"))
    agg.select(col("na"), col("nb"),
        expr("""CAST(cross_num * 1000000
              |div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""
          .stripMargin).as("e_cross_e6"),
        expr("""CAST(wa_num * 1000000
              |div (CAST(na AS DECIMAL(38,0)) * na) AS BIGINT)"""
          .stripMargin).as("e_within_a_e6"),
        expr("""CAST(wb_num * 1000000
              |div (CAST(nb AS DECIMAL(38,0)) * nb) AS BIGINT)"""
          .stripMargin).as("e_within_b_e6"))
      .withColumn("energy_e6",
        expr("2 * e_cross_e6 - e_within_a_e6 - e_within_b_e6"))
  }
}
