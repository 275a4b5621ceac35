package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Bilateral price indices (index-number theory: Laspeyres 1871,
  * Paasche 1874, Fisher 1922) — "how much did this basket's price
  * level move between two periods", the econ summary a marketplace
  * pipeline publishes monthly:
  *
  *   L·1e6 = Σ p₁q₀ · 1e6 div Σ p₀q₀      (base-period basket)
  *   P·1e6 = Σ p₁q₁ · 1e6 div Σ p₀q₁      (current-period basket)
  *   F·1e6 = isqrt(L_e6 · P_e6)            (Fisher ideal — the
  *            geometric mean lands exactly on the e6 grid via the
  *            corrected isqrt)
  *
  * over items present in BOTH periods (inner join — the matched
  * basket; unmatched items are counted, not silently priced at 0).
  * Prices are integer unit values p = Σvalue div Σqty per item/period
  * (the unit-value convention, pinned); quadratics in DECIMAL(38,0).
  *
  * Input: two frames at item grain (item, value_cents, qty). Scale
  * shape: two hash aggregates to item grain, one item join, one
  * single-row reduction. Output one row: (n_matched, n_only_base,
  * n_only_curr, laspeyres_e6, paasche_e6, fisher_e6). */
object PriceIndex {

  def bilateralE6(base: DataFrame, curr: DataFrame, item: Column,
      valueCents: Column, qty: Column): DataFrame = {
    def unit(df: DataFrame, p: String): DataFrame =
      df.select(item.as("item"), valueCents.cast("long").as("__v"),
          qty.cast("long").as("__q"))
        .where(col("__q") > 0L)
        .groupBy(col("item"))
        .agg(sum(col("__v")).as(s"${p}v"), sum(col("__q")).as(s"${p}q"))
        .withColumn(s"${p}p", expr(s"${p}v div ${p}q"))
    val b = unit(base, "b").truncate(true)
    val c = unit(curr, "c").truncate(true)
    val m = b.join(c, Seq("item"))
      .truncate(true) // three aggregates read the matched set
    val counts = b.join(c.select(col("item")), Seq("item"), "left_anti")
      .agg(count(lit(1)).as("n_only_base"))
      .crossJoin(broadcast(
        c.join(b.select(col("item")), Seq("item"), "left_anti")
          .agg(count(lit(1)).as("n_only_curr"))))
    val sums = m.agg(count(lit(1)).as("n_matched"),
      sum(expr("CAST(cp AS DECIMAL(38,0)) * bq")).as("__p1q0"),
      sum(expr("CAST(bp AS DECIMAL(38,0)) * bq")).as("__p0q0"),
      sum(expr("CAST(cp AS DECIMAL(38,0)) * cq")).as("__p1q1"),
      sum(expr("CAST(bp AS DECIMAL(38,0)) * cq")).as("__p0q1"))
    sums.crossJoin(broadcast(counts))
      .withColumn("laspeyres_e6", when(col("__p0q0") > 0L,
        expr("CAST(__p1q0 * 1000000 div __p0q0 AS BIGINT)")))
      .withColumn("paasche_e6", when(col("__p0q1") > 0L,
        expr("CAST(__p1q1 * 1000000 div __p0q1 AS BIGINT)")))
      .withColumn("__f2",
        expr("CAST(laspeyres_e6 AS DECIMAL(38,0)) * paasche_e6"))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__f2 AS DOUBLE))) AS BIGINT)"))
      .withColumn("fisher_e6", when(col("__f2").isNotNull, expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __f2
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __f2
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin)))
      .select(col("n_matched"), col("n_only_base"), col("n_only_curr"),
        col("laspeyres_e6"), col("paasche_e6"), col("fisher_e6"))
  }
}
