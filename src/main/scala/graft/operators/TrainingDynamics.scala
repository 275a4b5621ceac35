package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Training-dynamics data-quality maps over a per-epoch binary signal —
  * the two classic example-difficulty diagnostics, reduced to their
  * count-based cores so they run as census arithmetic on any
  * (unit, epoch, hit) stream:
  *
  *  - [[cartographyE6]] — Dataset Cartography (Swayamdipta et al.
  *    2020): each example's (confidence, variability) across epochs,
  *    bucketed into the easy-to-learn / hard-to-learn / ambiguous map
  *    regions that drive curation (ambiguous examples carry the most
  *    training signal; hard-to-learn ones are the mislabel-rich pool).
  *  - [[forgettingCensus]] — forgetting events (Toneva et al. 2019):
  *    per example the count of learned→forgotten transitions across
  *    ordered epochs; unforgettable examples (learned, never
  *    forgotten) are the safely-prunable mass.
  *
  * The binary signal is the caller's "did the example hit at epoch e"
  * (here: did the user convert that week; in a training pipeline: was
  * the example classified correctly at that checkpoint). Epochs are
  * GLOBAL: every unit is scored on the full epoch set, absent cells
  * count 0 — the zero-filled (unit × epoch) grid, with a loud bound on
  * the epoch count (epochs are checkpoints, never data-grain).
  *
  * Exactness: with binary x, Σx² = Σx = s, so over n epochs
  *   confidence_e6  = s·1e6 div n
  *   variability_e6 = isqrt(s·(n−s)·1e12 div n²)   (the exact
  *     population-σ identity n²σ² = s(n−s); corrected integer isqrt)
  * and regions split on caller-pinned integer thresholds. Forgetting
  * events compare consecutive epochs via one lead() in REAL per-unit
  * partitions.
  *
  * Scale shape: one hash aggregate to (unit, epoch) cells; the grid is
  * |units| × |epochs| with epochs broadcast (≤ [[maxEpochs]]); both
  * outputs are census-grain (region buckets / forget counts). */
object TrainingDynamics {

  private val maxEpochs = 1000L

  /** Zero-filled (unit, epoch, x) grid plus the global epoch count. */
  private def grid(df: DataFrame, unit: Column, epoch: Column,
      hit: Column): (DataFrame, Long) = {
    val cells = df.select(unit.as("u"), epoch.cast("long").as("ep"),
        hit.cast("boolean").as("x"))
      .where(col("u").isNotNull && col("ep").isNotNull)
      .groupBy(col("u"), col("ep"))
      .agg(max(when(col("x"), 1L).otherwise(0L)).as("x"))
      .truncate(true) // grid + distinct sides all read it
    val epochs = cells.select(col("ep")).distinct()
    val nEp = epochs.count()
    require(nEp >= 1 && nEp <= maxEpochs,
      s"TrainingDynamics: $nEp epochs — the epoch column must be " +
        s"checkpoint-grain (≤ $maxEpochs), not data-grain")
    val g = cells.select(col("u")).distinct()
      .crossJoin(broadcast(epochs))
      .join(cells, Seq("u", "ep"), "left")
      .select(col("u"), col("ep"), coalesce(col("x"), lit(0L)).as("x"))
    (g, nEp)
  }

  /** The cartography map census: (conf_bucket, var_bucket, region,
    * n_examples), buckets at 0.1 width (e6 div 100000). Regions:
    * variability > `ambigE6` → ambiguous; else confidence ≥ `easyE6`
    * → easy_to_learn, ≤ `hardE6` → hard_to_learn, else middle. */
  def cartographyE6(df: DataFrame, unit: Column, epoch: Column,
      hit: Column, easyE6: Long = 666667L, hardE6: Long = 333333L,
      ambigE6: Long = 400000L): DataFrame = {
    require(hardE6 < easyE6 && ambigE6 > 0L)
    val (g, nEp) = grid(df, unit, epoch, hit)
    val per = g.groupBy(col("u")).agg(sum(col("x")).as("s"))
      .withColumn("conf_e6", expr(s"s * 1000000 div ${nEp}L"))
      // isqrt of the truncated quotient s(n−s)·1e12 div n² — corrected
      // floor sqrt (the jonckheereE3 idiom)
      .withColumn("__v", expr(
        s"CAST(s AS DECIMAL(38,0)) * (${nEp}L - s) * 1000000000000" +
          s" div (${nEp}L * ${nEp}L)"))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__v AS DOUBLE))) AS BIGINT)"))
      .withColumn("var_e6", expr(
        """CASE WHEN __s0 * __s0 > __v THEN __s0 - 1
          | WHEN (__s0 + 1) * (__s0 + 1) <= __v THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .withColumn("region", expr(
        s"""CASE WHEN var_e6 > $ambigE6 THEN 'ambiguous'
           | WHEN conf_e6 >= $easyE6 THEN 'easy_to_learn'
           | WHEN conf_e6 <= $hardE6 THEN 'hard_to_learn'
           | ELSE 'middle' END""".stripMargin))
    per.groupBy(expr("conf_e6 div 100000").as("conf_bucket"),
        expr("var_e6 div 100000").as("var_bucket"), col("region"))
      .agg(count(lit(1)).as("n_examples"))
  }

  /** Forgetting-event census: per example the count of 1→0 transitions
    * across ordered epochs, grouped to (n_forget, ever_learned,
    * n_examples) — ever_learned ∧ n_forget = 0 is Toneva's
    * unforgettable (prunable) class. */
  def forgettingCensus(df: DataFrame, unit: Column, epoch: Column,
      hit: Column): DataFrame = {
    val (g, _) = grid(df, unit, epoch, hit)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ep"))
    g.withColumn("nx", lead(col("x"), 1).over(w))
      .groupBy(col("u"))
      .agg(sum(when(col("x") === 1L && col("nx") === 0L, 1L)
          .otherwise(0L)).as("n_forget"),
        max(col("x")).as("__learned"))
      .groupBy(col("n_forget"), (col("__learned") === 1L)
        .as("ever_learned"))
      .agg(count(lit(1)).as("n_examples"))
  }
}
