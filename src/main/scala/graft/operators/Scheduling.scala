package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted interval scheduling, per group — pick the non-overlapping
  * subset of a group's intervals maximizing total weight (the classic
  * O(n log n) DP: sort by end, dp(i) = max(dp(i−1), w(i) + dp(p(i))),
  * p(i) = last interval ending ≤ start(i)).
  *
  * Execution pattern NEW to this repo's batch side: a typed
  * `groupByKey.mapGroups` group-local DP — the right distribution for
  * problems that are inherently sequential WITHIN a key but embarrass-
  * ingly parallel ACROSS keys (each group's candidate set is bounded by
  * the deterministic top-K pre-filter below, so group state is O(K),
  * never O(rows)). Candidates: the K highest-weight intervals per group
  * (ties by id), pruned with an ordinary window BEFORE the typed hop so
  * the shuffle carries K rows per key, not the raw table.
  *
  * Overlap convention: [s, e) half-open — touching intervals (e == s')
  * are compatible. Deterministic: the DP value is unique (max), and the
  * pre-filter's (weight DESC, id) order is total.
  */
object Scheduling {

  /** Output: one row per group — (g, n_jobs ≤ topK, best — the optimal
    * non-overlapping total weight among the group's top-K candidates). */
  def bestNonOverlapping(df: DataFrame, groupCol: Column, startCol: Column,
      endCol: Column, weightCol: Column, idCol: Column,
      topK: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("w").desc, col("id").asc)
    val cands = df.select(groupCol.cast("long").as("g"),
        startCol.cast("long").as("s"), endCol.cast("long").as("e"),
        weightCol.cast("long").as("w"), idCol.cast("long").as("id"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= topK)
      .drop("__rk")
      .as[(Long, Long, Long, Long, Long)]
    cands.groupByKey(_._1)
      .mapGroups { (g, it) =>
        val jobs = it.toArray.sortBy(j => (j._3, j._2, j._5)) // by (e, s, id)
        val n = jobs.length
        val dp = new Array[Long](n + 1)
        var i = 0
        while (i < n) {
          val (_, s, _, jw, _) = jobs(i)
          // p(i): rightmost j (1-based) with e(j) <= s — linear scan is
          // fine at K ≤ ~20; binary search if K ever grows
          var p = i
          while (p > 0 && jobs(p - 1)._3 > s) p -= 1
          dp(i + 1) = math.max(dp(i), jw + dp(p))
          i += 1
        }
        (g, n.toLong, dp(n))
      }
      .toDF("g", "n_jobs", "best")
  }
}
