package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

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

  /** Grid-density clustering — cell-granular DBSCAN (Ester et al. 1996,
    * on the fixed grid the way GriDBSCAN/NG-DBSCAN coarsen it): a CELL
    * is core when it holds ≥ minPts points, clusters are the
    * 8-connected components of core cells. Components resolve by
    * `rounds` PAIRS of min-label propagation + pointer shortcutting
    * (lab ← lab[lab], the hash-to-min idea of Rastogi et al. 2013):
    * plain sweeps cover one cell-hop per round so a diameter-d cluster
    * would need d of them, while the shortcut DOUBLES the effective
    * reach per pair — rounds = 8 resolves diameters into the hundreds
    * (a fully-core 55×10 grid converges in 5). Deterministic for any
    * rounds (the [[Graph.boundedSssp]] fixed-rounds convention);
    * sparse cells are noise and never enter the propagation.
    *
    * Shape: one cell census (map-side combined), a 3×3 probe equi-join
    * among CORE cells only (density pruning before any pairing), then
    * per pair two tiny self-joins over the core frame with eager
    * localCheckpoints (label frames feed two consumers each).
    * Coordinates non-negative; cell ids pack as cx·2³² + cy (enforced
    * cy < 2³²). Output: (cx, cy, n_points, cluster). */
  def gridDbscan(df: DataFrame, x: Column, y: Column, cellX: Long,
      cellY: Long, minPts: Long, rounds: Int): DataFrame = {
    require(cellX > 0 && cellY > 0 && minPts >= 1 &&
      rounds >= 1 && rounds <= 64)
    def nonNeg(c: Column, name: String): Column =
      when(c < 0, raise_error(concat(lit(s"gridDbscan: negative $name "),
        c.cast("string"), lit(" — shift coordinates first")))).otherwise(c)
    val cells = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .select(nonNeg(col("x"), "x").as("x"), nonNeg(col("y"), "y").as("y"))
      .groupBy(expr(s"x div ${cellX}L").as("cx"),
        expr(s"y div ${cellY}L").as("cy"))
      .agg(count(lit(1)).as("n_points"))
    val core = cells.where(col("n_points") >= minPts)
      .withColumn("cid", when(col("cy") >= 4294967296L,
          raise_error(concat(lit("gridDbscan: cy "), col("cy").cast("string"),
            lit(" exceeds the 32-bit pack range"))))
        .otherwise(col("cx") * 4294967296L + col("cy")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = core
      .withColumn("d", explode(array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(col("cid").as("a"), (col("cx") + col("d.dx")).as("pcx"),
        (col("cy") + col("d.dy")).as("pcy"))
      .join(core.select(col("cx").as("pcx"), col("cy").as("pcy"),
        col("cid").as("b")), Seq("pcx", "pcy"))
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = core.select(col("cid"), col("cid").as("lab"))
      .truncate(true)
    for (_ <- 1 to rounds) {
      val nb = edges.join(labels.select(col("cid").as("b"), col("lab")), "b")
        .groupBy(col("a").as("cid")).agg(min(col("lab")).as("nb"))
      val swept = labels.join(nb, Seq("cid"), "left")
        .select(col("cid"), least(col("lab"), coalesce(col("nb"),
          col("lab"))).as("lab"))
        .truncate(true)
      // pointer shortcut: labels always point at core cells, so chase
      // one indirection — doubles the reach covered per pair
      labels = swept
        .join(swept.select(col("cid").as("lab"), col("lab").as("lab2")),
          Seq("lab"))
        .select(col("cid"), col("lab2").as("lab"))
        .truncate(true)
    }
    core.join(labels, "cid")
      .select(col("cx"), col("cy"), col("n_points"),
        col("lab").as("cluster"))
  }
}
