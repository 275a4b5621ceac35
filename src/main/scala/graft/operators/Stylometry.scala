package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Burrows' Delta authorship/provenance attribution (Burrows 2002;
  * Argamon 2008 for the formal reading) — the standard stylometric
  * distance: represent each text by the z-scores of its top-K
  * function-word frequencies (z against the spread ACROSS candidate
  * profiles) and attribute to the candidate with the smallest mean
  * absolute z difference. The pipeline use: "which source does this
  * document's style match" — provenance checks, contamination
  * forensics, style-mix audits.
  *
  * Exact integer discipline:
  *  - relative frequencies at e9: rf = cnt·1e9 div total_tokens
  *    (profile = source, text = document; totals include non-top
  *    words — pinned);
  *  - z numerator cleared of the mean division: k·rf − Σ_g rf;
  *  - z denominator k·σ = isqrt(k·var_num div (k−1)) with var_num =
  *    k·Σrf² − (Σrf)² (corrected isqrt, exact); words with zero
  *    cross-profile variance carry no signal and are EXCLUDED from
  *    the sum (both engines, same predicate);
  *  - z_e6 = num·1e6 div den (toward zero), delta_e6 = Σ|z_d − z_g|
  *    div n_words_used.
  *
  * Scale shape: one token pass → word census → TakeOrdered top-K;
  * source profiles and doc vectors are (entity × K) grids built by
  * broadcast joins against the K-row word list (zero-filled — absence
  * IS a style signal); the attribution join is docs × sources × K,
  * linear in the corpus for bounded K and source count. Argmin by ONE
  * struct-min aggregate. Output: (idCol, actual, best, delta_e6,
  * is_correct, n_words_used). */
object Stylometry {

  def burrowsDeltaAttribution(docs: DataFrame, idCol: String,
      textCol: String, groupCol: String, topWords: Int): DataFrame = {
    require(topWords >= 1 && topWords <= 1000,
      s"Stylometry: need 1 ≤ topWords ≤ 1000, got $topWords")
    val toks = docs.select(col(idCol).as("id"), col(groupCol).as("g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .truncate(true) // word census, group grid, doc grid
    val topW = toks.groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(topWords)
      .select(col("w"))
    val groups = toks.select(col("g")).distinct()
    val gTotals = toks.groupBy(col("g")).agg(count(lit(1)).as("gt"))
    val gCounts = toks.join(broadcast(topW), Seq("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
    val gGrid = groups.crossJoin(broadcast(topW))
      .join(gCounts, Seq("g", "w"), "left")
      .join(gTotals, Seq("g"))
      .select(col("g"), col("w"),
        expr("coalesce(c, 0) * 1000000000 div gt").as("rf"))
      .truncate(true)
    // cross-profile moments per word (k = #groups)
    val wstats = gGrid.groupBy(col("w"))
      .agg(count(lit(1)).as("k"), sum(col("rf")).as("srf"),
        sum(expr("CAST(rf AS DECIMAL(38,0)) * rf")).as("qrf"))
      .withColumn("var_num",
        expr("k * qrf - CAST(srf AS DECIMAL(38,0)) * srf"))
      .withColumn("__v2", expr(
        """CAST((CAST(k AS DECIMAL(38,0)) * var_num
          | - pmod(CAST(k AS DECIMAL(38,0)) * var_num, k - 1))
          | / (k - 1) AS DECIMAL(38,0))""".stripMargin))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__v2 AS DOUBLE))) AS BIGINT)"))
      .withColumn("den", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __v2
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __v2
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .where(col("den") > 0L)
      .select(col("w"), col("k"), col("srf"), col("den"))
    def zOf(grid: DataFrame, rfCol: String): Column = expr(
      s"""CASE WHEN k * $rfCol - srf >= 0
         | THEN CAST((k * $rfCol - srf) * 1000000 div den AS BIGINT)
         | ELSE -CAST((-(k * $rfCol - srf)) * 1000000 div den AS BIGINT)
         |END""".stripMargin)
    val gz = gGrid.join(broadcast(wstats), Seq("w"))
      .select(col("g"), col("w"), zOf(gGrid, "rf").as("zg"))
    val dTotals = toks.groupBy(col("id"), col("g"))
      .agg(count(lit(1)).as("dt"))
    val dCounts = toks.join(broadcast(topW), Seq("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    val dGrid = dTotals.crossJoin(broadcast(topW))
      .join(dCounts, Seq("id", "w"), "left")
      .select(col("id"), col("g").as("actual"), col("w"),
        expr("coalesce(c, 0) * 1000000000 div dt").as("rf"))
    val dz = dGrid.join(broadcast(wstats), Seq("w"))
      .select(col("id"), col("actual"), col("w"),
        zOf(dGrid, "rf").as("zd"))
    val deltas = dz
      .join(broadcast(gz.withColumnRenamed("w", "w2")),
        col("w") === col("w2"))
      .groupBy(col("id"), col("actual"), col("g"))
      .agg(count(lit(1)).as("nw"),
        sum(expr("abs(zd - zg)")).as("sumabs"))
      .withColumn("delta_e6", expr("sumabs div nw"))
    deltas.groupBy(col("id"), col("actual"))
      .agg(min(struct(col("delta_e6"), col("g"), col("nw"))).as("b"))
      .select(col("id").as(idCol), col("actual"),
        col("b.g").as("best"), col("b.delta_e6").as("delta_e6"),
        (col("actual") === col("b.g")).as("is_correct"),
        col("b.nw").as("n_words_used"))
  }
}
