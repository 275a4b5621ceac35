package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal, the 2-approximation; the diversity-sampling half of
  * modern data-pruning recipes — pick the k points that COVER the
  * embedding space, where SemDeDup (q58) removes the redundant ones).
  *
  * Distances are squared Euclidean with the repo's embedding-parity
  * quantization (per-term `round((aᵢ−bᵢ)²·10⁹)` longs, summed), so
  * selection is bit-deterministic and oracle-exact; ties break to the
  * smallest id.
  *
  * Scale shape: k−1 rounds, each ONE narrow scan — the freshly chosen
  * center travels as a LITERAL array in the comparison expression (64
  * doubles of plan constant, no join, no shuffle), the running min-dist
  * column folds with `least`, and the round's argmax is a TakeOrdered
  * (per-partition top-1 then driver merge), never a global sort. Plans
  * are truncated per round with an eager localCheckpoint so round r's
  * lineage is O(1), not O(r) (the q84/LPA lesson). The final assignment
  * pass scores all k centers in one expression and aggregates to k
  * rows. Total: 2(k−1)+2 scans, zero wide shuffles.
  */
object Coreset {

  private def litVec(v: Seq[Double]): Column =
    array(v.map(lit): _*)

  /** Quantized squared-Euclidean distance between `vecCol` (float
    * array) and a constant center. */
  private def distTo(vec: Column, center: Seq[Double]): Column =
    aggregate(
      zip_with(vec, litVec(center), (x, y) =>
        round((x.cast("double") - y) * (x.cast("double") - y)
          * 1000000000d).cast("long")),
      lit(0L), (acc, e) => acc + e)

  /** Output: one row per selected center —
    * (center_id, sel_round 1-based, sel_dist — the point's min-dist at
    * selection, NULL for the seed — and n_assigned from the final
    * nearest-center pass, ties to the earlier round). */
  def kCenter(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
        r.getSeq[Float](r.fieldIndex("v")).map(_.toDouble)
      val seed = base.orderBy(col("id")).limit(1).collect().head
      val centers = scala.collection.mutable.ArrayBuffer(
        (seed.getLong(0), vecOf(seed), Option.empty[Long]))
      var state = base.withColumn("mind", distTo(col("v"), centers(0)._2))
        .truncate(true)
      for (_ <- 2 to k) {
        val next = state.orderBy(col("mind").desc, col("id").asc)
          .limit(1).collect().head
        val nv = vecOf(next)
        centers += ((next.getLong(0), nv,
          Some(next.getLong(next.fieldIndex("mind")))))
        state = state.withColumn("mind",
            least(col("mind"), distTo(col("v"), nv)))
          .truncate(true)
      }
      // Nearest-center assignment: array of (dist, round) structs;
      // array_min's struct ordering = (dist, round) lexicographic, so
      // exact ties go to the earlier-selected center.
      val scored = array(centers.zipWithIndex.map { case ((_, cv, _), i) =>
        struct(distTo(col("v"), cv).as("d"), lit(i + 1).cast("long").as("o"))
      }.toSeq: _*)
      val assigned = base
        .select(array_min(scored).getField("o").as("sel_round"))
        .groupBy("sel_round").agg(count(lit(1)).as("n_assigned"))
      val sel = spark.createDataFrame(centers.zipWithIndex.map {
        case ((id, _, d), i) => (id, (i + 1).toLong, d)
      }.toSeq).toDF("center_id", "sel_round", "sel_dist")
      sel.join(assigned, Seq("sel_round"), "left")
        .na.fill(0L, Seq("n_assigned"))
        .select(col("center_id"), col("sel_round"), col("sel_dist"),
          col("n_assigned"))
        .truncate(true)
    } finally base.unpersist(): Unit
  }
}
