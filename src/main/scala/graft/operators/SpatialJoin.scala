package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-partitioned neighborhood (distance) self-join — the spatial-join
  * shape: all point pairs within an L∞ box (|Δx| ≤ rx AND |Δy| ≤ ry),
  * found without a cross product by bucketing each point into a grid
  * cell of exactly (rx, ry) size, so every qualifying pair sits in the
  * same or an adjacent cell (the classic fixed-grid spatial join, e.g.
  * Patel & DeWitt PBSM 1996).
  *
  * Plan: each point probes its 3×3 cell neighborhood (a 9-row explode
  * on the LEFT side only), equi-joins on the probed cell against the
  * right side's home cell, then the exact box predicate verifies. A
  * pair is found exactly once (the right point's home cell is unique),
  * so no distinct pass. Shuffle is hash-by-cell — points per cell, not
  * points²; a hot cell degrades only its own bucket, the standard skew
  * story (salting composes if needed).
  *
  * Coordinates must be NON-NEGATIVE integers (callers shift first):
  * integer `div` truncates toward zero, which equals the floor the grid
  * needs only for non-negative inputs — enforced, not assumed.
  */
object SpatialJoin {

  /** Pairs (a_id < b_id) with |Δx| ≤ rx and |Δy| ≤ ry, plus the
    * absolute deltas. */
  def boxSelfJoin(df: DataFrame, idCol: String, x: Column, y: Column,
      rx: Long, ry: Long): DataFrame = {
    require(rx > 0 && ry > 0, s"radii must be positive: rx=$rx ry=$ry")
    def nonNeg(c: Column, name: String): Column =
      when(c < 0, raise_error(concat(lit(s"SpatialJoin: negative $name "),
        c.cast("string"), lit(" — shift coordinates first")))).otherwise(c)
    val pts = df.select(col(idCol).cast("long").as("id"),
        x.cast("long").as("x"), y.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .select(col("id"), nonNeg(col("x"), "x").as("x"),
        nonNeg(col("y"), "y").as("y"))
    val cells = pts
      .withColumn("cx", expr(s"x div ${rx}L"))
      .withColumn("cy", expr(s"y div ${ry}L"))
    val probes = cells
      .withColumn("d", explode(array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("d.dx")).as("pcx"),
        (col("cy") + col("d.dy")).as("pcy"))
    probes.join(
        cells.select(col("id").as("b_id"), col("x").as("bx"),
          col("y").as("by"), col("cx").as("pcx"), col("cy").as("pcy")),
        Seq("pcx", "pcy"))
      .where(col("a_id") < col("b_id") &&
        abs(col("ax") - col("bx")) <= rx &&
        abs(col("ay") - col("by")) <= ry)
      .select(col("a_id"), col("b_id"),
        abs(col("ax") - col("bx")).as("dx_abs"),
        abs(col("ay") - col("by")).as("dy_abs"))
  }
}
