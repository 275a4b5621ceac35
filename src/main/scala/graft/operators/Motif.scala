package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matrix-profile-style motif discovery over keyed series (Yeh et al.
  * 2016, "Matrix Profile I" — the exact STAMP baseline, in plain
  * Euclidean rather than z-normalized form so integer inputs stay
  * integers): for every length-`m` window of each key's series, the
  * nearest OTHER window of the same series (trivial matches |i−j| < m
  * excluded) and its exact squared distance. Low-profile positions are
  * the series' motifs (repeated structure); high-profile positions are
  * discords (anomalies) — the two readings pipelines mine the profile
  * for.
  *
  * Exactness: values are BIGINT, the distance is the exact integer
  * Σ(aₖ−bₖ)², and the neighbor argmin tie-breaks on the smaller
  * position — bit-stable under any partitioning, and a SQL oracle can
  * replay window construction + the O(w²) self-join verbatim.
  *
  * Scale shape: windows build with `m−1` leads in ONE window pass per
  * key (no explode), then the all-pairs step self-joins ON THE KEY ONLY
  * — per-key quadratic, cross-key parallel, the standard exact-profile
  * layout when keys are many and series are bounded (per-day device
  * series, per-entity metric series). A 10⁶-point single series needs
  * the FFT-based MASS path instead — out of scope for the exact
  * integer gate.
  */
object Motif {

  def nearestWindow(series: DataFrame, keyCols: Seq[String], ordCol: Column,
      valCol: Column, m: Int = 4): DataFrame = {
    require(m >= 2, "window length m must be >= 2")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(ordCol)
    val vals = (0 until m).map(k => s"__v$k")
    var df = series
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("__v0", valCol.cast("long"))
    (1 until m).foreach { k =>
      df = df.withColumn(s"__v$k", lead(col("__v0"), k).over(w))
    }
    val windows = df.where(col(s"__v${m - 1}").isNotNull)
      .select(keys :+ col("pos") :+
        array(vals.map(col): _*).as("vec"): _*)

    val a = windows.select(keys :+ col("pos").as("i") :+
      col("vec").as("va"): _*)
    val b = windows.select(keys :+ col("pos").as("j") :+
      col("vec").as("vb"): _*)
    val dist = (0 until m).map(k =>
        (col("va")(k) - col("vb")(k)) * (col("va")(k) - col("vb")(k)))
      .reduce(_ + _)
    val pairs = a.join(b, keyCols)
      .where(abs(col("i") - col("j")) >= m)
      .select(keys :+ col("i") :+ col("j") :+ dist.as("d2"): _*)
    val rank = Window.partitionBy(keys.map(k => k) :+ col("i"): _*)
      .orderBy(col("d2"), col("j"))
    pairs.withColumn("__rn", row_number().over(rank))
      .where(col("__rn") === 1)
      .select(keys :+ col("i") :+ col("j").as("nn_j") :+
        col("d2").as("nn_d2"): _*)
  }
}
