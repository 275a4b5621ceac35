package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Iterative proportional fitting / raking (Deming & Stephan 1940) —
  * the survey-calibration step every production analytics stack runs
  * when a logged sample must be re-weighted so its margins match known
  * population totals (post-stratification on two dimensions whose JOINT
  * distribution is unknown).
  *
  * Input: a sample at unit grain with two categorical keys, plus two
  * margin-target frames (key → target count) computed from the
  * population. Output: one row per observed (rowKey, colKey) CELL with
  * the cell size and the calibrated total weight after `rounds` rounds
  * of row-then-column scaling.
  *
  * Exact integer convention (mirrored literally in the oracle): cell
  * weights live at e6 scale (initial weight = n·1e6, i.e. every unit
  * starts at weight 1.0); one scaling step replaces W by
  *
  *   W' = (W · T · 1e6) div M
  *
  * where T is the margin's integer target and M the margin's current
  * e6 weight sum — the product widens to DECIMAL(38,0) and the
  * division is the truncating `div` (DuckDB `//` on HUGEINT). The
  * quotient is ≤ T·1e6 (W ≤ M always), so it fits LONG whenever the
  * documented N·1e6-fits-LONG contract holds. Step order is pinned:
  * rows first, then columns, `rounds` times. A margin whose current
  * weight sum is 0 (every cell already zeroed by a 0 target) keeps its
  * cells at 0 rather than dividing by zero — both engines.
  *
  * Scale shape: IPF multipliers are constant within a cell, so 100 TB
  * of units collapse in ONE map-side-combined hash aggregate to the
  * (rowKey × colKey) cell census; every round is two broadcast-join +
  * tiny-aggregate steps on that census, whose size is bounded by the
  * key domains (e.g. nations × segments), never by the unit count.
  * Margins that appear in the sample but not in the target frame get
  * target 0 (standard raking practice: their weight collapses), and
  * target-only margins have no cells to scale.
  */
object Raking {

  /** `rowTargets`/`colTargets`: two-column frames (key, target count).
    * Returns (rk, ck, n, w_e6). */
  def rakeE6(sample: DataFrame, rowKey: Column, colKey: Column,
      rowTargets: DataFrame, colTargets: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"Raking.rakeE6: rounds must be in [1,16], got $rounds")
    val rt = broadcast(rowTargets.toDF("rk", "rt"))
    val ct = broadcast(colTargets.toDF("ck", "ctg"))
    var cells = sample
      .select(rowKey.as("rk"), colKey.as("ck"))
      .groupBy(col("rk"), col("ck"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w_e6", expr("n * 1000000"))
    for (_ <- 1 to rounds) {
      val rowSums = cells.groupBy(col("rk"))
        .agg(sum(col("w_e6")).as("rm"))
      cells = cells
        .join(broadcast(rowSums), Seq("rk"))
        .join(rt, Seq("rk"), "left")
        .withColumn("w_e6",
          when(col("rm") > 0L, expr(
            """CAST(CAST(w_e6 AS DECIMAL(38,0)) * coalesce(rt, 0)
              | * 1000000 div rm AS BIGINT)""".stripMargin))
            .otherwise(0L))
        .drop("rm", "rt")
      val colSums = cells.groupBy(col("ck"))
        .agg(sum(col("w_e6")).as("cm"))
      cells = cells
        .join(broadcast(colSums), Seq("ck"))
        .join(ct, Seq("ck"), "left")
        .withColumn("w_e6",
          when(col("cm") > 0L, expr(
            """CAST(CAST(w_e6 AS DECIMAL(38,0)) * coalesce(ctg, 0)
              | * 1000000 div cm AS BIGINT)""".stripMargin))
            .otherwise(0L))
        .drop("cm", "ctg")
      // Census-grain frame, but 2 joins + 2 aggregates per round deepen
      // lineage fast; the eager per-round checkpoint keeps the planner
      // linear (same documented necessity as the Bradley–Terry MM
      // rounds in Preference.bradleyTerryE6).
      cells = cells.truncate(true)
    }
    cells.select(col("rk"), col("ck"), col("n"), col("w_e6"))
  }
}
