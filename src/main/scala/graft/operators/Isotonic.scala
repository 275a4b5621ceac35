package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact L2 isotonic regression over pre-aggregated bins — the
  * calibration fit (Zadrozny & Elkan 2002; the classic PAV of Ayer et
  * al. 1955) that turns a noisy per-bin success rate into the best
  * monotone non-decreasing curve.
  *
  * Instead of the sequential pool-adjacent-violators loop, this uses the
  * MINIMAX CLOSED FORM of the same fit (Robertson–Wright–Dykstra 1988,
  * §1.2):
  *
  *   fitted_i = max_{j ≤ i} min_{k ≥ i} mean(y_j..y_k)
  *
  * which is pure joins + aggregates — no iteration, no UDF. Exactness:
  * interval means truncate to e6 BEFORE the min/max, and truncation is
  * MONOTONE, so it commutes with min and max — the result is exactly
  * ⌊10⁶ · exact fit⌋, engine-independent, and the fitted curve stays
  * non-decreasing (IsotonicSpec pins both).
  *
  * Scale contract: bins per key are FEW (calibration deciles/ventiles —
  * the caller has already aggregated raw events down to bins); the
  * interval expansion is O(bins²) per key and every frame after the
  * first aggregate is key×bins-sized. The raw-event aggregation upstream
  * is the only big-data pass.
  */
object Isotonic {

  /** Fit over pre-aggregated bins. Input columns: key cols + (bin,
    * sum, cnt) with cnt > 0; output adds rate_e6 (raw per-bin mean) and
    * fitted_e6 (the isotonic fit), both ⌊·10⁶⌋. */
  def isotonicFit(df: DataFrame, keyCols: Seq[String], binCol: String,
      sumCol: String, cntCol: String): DataFrame = {
    val base = df.select(keyCols.map(col) ++ Seq(
      col(binCol).cast("long").as("bin"),
      col(sumCol).cast("long").as("s"),
      col(cntCol).cast("long").as("c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base
      .withColumn("ps", sum(col("s")).over(w))
      .withColumn("pc", sum(col("c")).over(w))
    val lo = cum.select(keyCols.map(col) ++ Seq(col("bin").as("j"),
      (col("ps") - col("s")).as("ps0"), (col("pc") - col("c")).as("pc0")): _*)
    val hi = cum.select(keyCols.map(c => col(c).as(c + "__h")) ++ Seq(
      col("bin").as("k"), col("ps").as("ps1"), col("pc").as("pc1")): _*)
    val kJoin = keyCols.map(c => col(c) === col(c + "__h")).reduce(_ && _)
    // every interval j..k with its e6-truncated mean
    val intervals = lo.join(hi, kJoin && col("j") <= col("k"))
      .select(keyCols.map(col) ++ Seq(col("j"), col("k"),
        expr("(ps1 - ps0) * 1000000 div (pc1 - pc0)").as("m")): _*)
    val pos = base.select(keyCols.map(c => col(c).as(c + "__p")) :+
      col("bin").as("i"): _*)
    val pJoin = keyCols.map(c => col(c) === col(c + "__p")).reduce(_ && _)
    val fitted = intervals
      .join(pos, pJoin && col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(keyCols.map(col) ++ Seq(col("i"), col("j")): _*)
      .agg(min(col("m")).as("mn")) // min over k ≥ i, j fixed
      .groupBy(keyCols.map(col) :+ col("i"): _*)
      .agg(max(col("mn")).as("fitted_e6")) // max over j ≤ i
      .select(keyCols.map(c => col(c).as(c + "__f")) ++
        Seq(col("i"), col("fitted_e6")): _*)
    val fJoin = keyCols.map(c => col(c) === col(c + "__f")).reduce(_ && _)
    base
      .withColumn("rate_e6", expr("s * 1000000 div c"))
      .join(fitted, fJoin && col("bin") === col("i"))
      .select(keyCols.map(col) ++ Seq(col("bin"), col("s").as(sumCol),
        col("c").as(cntCol), col("rate_e6"), col("fitted_e6")): _*)
  }
}
