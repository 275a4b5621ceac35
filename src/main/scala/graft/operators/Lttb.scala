package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, the
  * standard dashboard decimator): keep first and last point, split the
  * middle into B buckets, and from each bucket keep the point forming
  * the LARGEST TRIANGLE with the previously-selected point and the
  * NEXT bucket's centroid — the visually-optimal polyline of B+2
  * points for a series of any length.
  *
  * Exactness: the centroid divides by the next bucket's size n₃, so
  * areas are compared SCALED BY n₃ — |(x₁n₃ − Σx₃)(y₂ − y₁) −
  * (x₁ − x₂)(Σy₃ − y₁n₃)| — pure BigInt arithmetic, no division ever;
  * within a bucket n₃ is constant so the argmax is unchanged. Ties
  * break to the smaller x. Selection is inherently sequential (the
  * previous pick is a triangle vertex), so this is the same
  * group-local shape as [[Scheduling]]: typed `flatMapGroups`,
  * sequential within a series, parallel across series; per-group state
  * is the series' points (time series at daily/hourly grain — bounded;
  * for raw-event grain pre-aggregate first, which is what q283 does).
  */
object Lttb {

  /** Output: (series, x, y) — the ≤ buckets+2 selected points per
    * series (all points when the series is already that short). */
  def downsample(df: DataFrame, seriesCol: Column, xCol: Column,
      yCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(seriesCol.cast("string").as("series"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(_._1)
        val n = pts.length
        if (n <= buckets + 2) pts.iterator.map(p => (g, p._1, p._2))
        else {
          val m = n - 2
          // bucket of middle index j ∈ [0, m): j*B div m
          def bucketPts(i: Int): Array[(Long, Long)] =
            (0 until m).filter(j => j.toLong * buckets / m == i)
              .map(j => pts(j + 1)).toArray
          val sel = scala.collection.mutable.ArrayBuffer(pts(0))
          for (i <- 0 until buckets) {
            val cand = bucketPts(i)
            val (n3, sx3, sy3) =
              if (i + 1 < buckets) {
                val nb = bucketPts(i + 1)
                (BigInt(nb.length), BigInt(nb.map(_._1).sum),
                  BigInt(nb.map(_._2).sum))
              } else (BigInt(1), BigInt(pts(n - 1)._1), BigInt(pts(n - 1)._2))
            val (x1, y1) = sel.last
            val best = cand.maxBy { case (x2, y2) =>
              val a = ((BigInt(x1) * n3 - sx3) * BigInt(y2 - y1) -
                BigInt(x1 - x2) * (sy3 - BigInt(y1) * n3)).abs
              (a, -x2) // larger area, then smaller x
            }
            sel += best
          }
          sel += pts(n - 1)
          sel.iterator.map(p => (g, p._1, p._2))
        }
      }
      .toDF("series", "x", "y")
  }
}
