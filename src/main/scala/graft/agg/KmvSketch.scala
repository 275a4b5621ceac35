package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash64

/** KMV ("k minimum values" / bottom-k) sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007) — the sketch family that, unlike HLL, supports SET
  * OPERATIONS: the k smallest distinct hash values of a set are a uniform
  * sample of its distinct elements, so bottom-k(A ∪ B) derives from the
  * two samples alone, and |A ∩ B| estimates from sample-membership counts
  * (the basis of theta sketches).
  *
  * Everything here is declarative and deterministic: PolyHash64 values,
  * per-group bottom-k via a ranked window (the rank ≤ k predicate pushes
  * below the exchange as a WindowGroupLimit partial top-k), and INTEGER
  * intersection-match counts — no custom aggregate needed, and every step
  * replays in SQL.
  */
object KmvSketch {

  /** Per-group bottom-k distinct hashes: (g, h, rn ≤ k). */
  def bottomK(df: DataFrame, groupCol: String, valueCol: String, k: Int)
      : DataFrame = {
    PolyHash64.register(df.sparkSession)
    val hashed = df.select(col(groupCol).as("g"),
      PolyHash64.polyHash64(col(valueCol)).as("h")).distinct()
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Jaccard match counts for every group pair: from each pair's UNION
    * bottom-k (derived from the two samples alone — the KMV closure
    * property), `matches` = how many sampled hashes belong to BOTH
    * samples. Jaccard ≈ matches / union_k; both terms are integers, exact
    * given the hashes, so the result is hash-gateable. The samples frame
    * is persisted (it feeds both pair sides); the pair frame is
    * groups², broadcast-small for any realistic group cardinality.
    * Output: (g_a, g_b, union_k, matches). */
  def jaccardMatchCounts(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    val sk = bottomK(df, groupCol, valueCol, k).select(col("g"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = sk.select(col("g")).distinct()
    val gPairs = broadcast(groups.select(col("g").as("g_a"))
      .join(groups.select(col("g").as("g_b")), col("g_a") < col("g_b")))
    val fromA = gPairs.join(sk.withColumnRenamed("g", "g_a"), Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(1).as("inA"), lit(0).as("inB"))
    val fromB = gPairs.join(sk.withColumnRenamed("g", "g_b"), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(0).as("inA"), lit(1).as("inB"))
    val unionHashes = fromA.unionByName(fromB)
      .groupBy(col("g_a"), col("g_b"), col("h"))
      .agg(max(col("inA")).as("inA"), max(col("inB")).as("inB"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("h"))
    unionHashes.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("union_k"),
        sum((col("inA") * col("inB")).cast("long")).as("matches"))
  }

  /** The order-preserving unsigned position of a signed hash: u = h + 2^63
    * ∈ [0, 2^64), uniform, and ascending-signed-h = ascending-u — so the
    * bottom-k by signed h IS the bottom-k of this uniform draw, and the
    * kth value supports the classic estimator D̂ = (k−1)·2^64 / u_k
    * (Bar-Yossef et al. 2002). All arithmetic in DECIMAL(38,0) with
    * integral `div` — exact, and replayable in HUGEINT SQL. */
  private def estExpr(k: Int, kthCol: String): Column = {
    val numerator = (BigInt(k - 1) << 64).toString
    expr(s"""CAST(CAST('$numerator' AS DECIMAL(38,0)) div
      (CAST($kthCol AS DECIMAL(38,0)) + 9223372036854775808) AS BIGINT)""")
  }

  /** Per-group distinct-count estimate from the bottom-k sketch. A group
    * whose sketch is not full (fewer than k distinct values) is counted
    * EXACTLY — the sketch is the whole set. Output:
    * (g, sketch_size, est_distinct). */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame =
    bottomK(df, groupCol, valueCol, k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("sketch_size"),
        max(when(col("rn") === k, col("h"))).as("__kth"))
      .withColumn("est_distinct",
        when(col("sketch_size") < k, col("sketch_size"))
          .otherwise(estExpr(k, "__kth")))
      .drop("__kth")

  /** Theta-sketch-style set-operation estimates for every group pair:
    * from each pair's union bottom-k, |A∪B| estimates from the union's
    * kth minimum and |A∩B| as matches·|A∪B|̂ / k_u (Beyer et al. 2007) —
    * the audience-overlap primitive ("how many users do these two
    * segments share?") that HLL cannot answer. Under-full union sketches
    * degrade to exact counts. All-integer outputs:
    * (g_a, g_b, union_k, matches, est_union, est_inter). */
  def intersectionEstimate(df: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    val sk = bottomK(df, groupCol, valueCol, k).select(col("g"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = sk.select(col("g")).distinct()
    val gPairs = broadcast(groups.select(col("g").as("g_a"))
      .join(groups.select(col("g").as("g_b")), col("g_a") < col("g_b")))
    val fromA = gPairs.join(sk.withColumnRenamed("g", "g_a"), Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(1).as("inA"), lit(0).as("inB"))
    val fromB = gPairs.join(sk.withColumnRenamed("g", "g_b"), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("h"),
        lit(0).as("inA"), lit(1).as("inB"))
    val unionHashes = fromA.unionByName(fromB)
      .groupBy(col("g_a"), col("g_b"), col("h"))
      .agg(max(col("inA")).as("inA"), max(col("inB")).as("inB"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("h"))
    unionHashes.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("union_k"),
        sum((col("inA") * col("inB")).cast("long")).as("matches"),
        max(when(col("rn") === k, col("h"))).as("__kth"))
      .withColumn("est_union",
        when(col("union_k") < k, col("union_k"))
          .otherwise(estExpr(k, "__kth")))
      .withColumn("est_inter",
        expr("matches * est_union div union_k"))
      .drop("__kth")
  }
}
