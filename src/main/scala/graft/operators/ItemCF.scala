package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Item-item co-engagement similarity — the collaborative-filtering prep
  * pass ("users who engaged X also engaged Y"): for every item pair, the
  * count of users engaging BOTH, with the cosine over binary engagement
  * vectors decided in exact integers
  * (cos² · 10¹² = cooc²·10¹² / (n_a·n_b), floor division — monotone in
  * cosine for ranking, no float drift).
  *
  * Shape (the classic CF skeleton): the (user, item) incidence DEDUPES
  * first — multiple engagements count once, and the dedupe is what
  * bounds the self-join — then pairs form per user (co-occurrence is a
  * self-join keyed on the user: each user contributes ≤ items²/2 pairs,
  * bounded by the per-user catalog slice, NEVER a global item×item
  * product), and per-item user counts broadcast back onto the pair
  * census. Power users are the skew: cap or sample their incidence rows
  * upstream at 100 TB (the reference's interval-join degradation lever —
  * here the `maxItemsPerUser` guard raises instead of silently exploding).
  * Output: (item_a, item_b, cooc, n_a, n_b, cos2_e12), a < b,
  * cooc ≥ minCooc. */
object ItemCF {

  def itemSimilarity(df: DataFrame, userCol: Column, itemCol: Column,
      minCooc: Long, maxItemsPerUser: Long = 10000L): DataFrame = {
    require(minCooc >= 1)
    val inc = df.select(userCol.cast("string").as("u"),
        itemCol.cast("string").as("item"))
      .where(col("u").isNotNull && col("item").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // loud skew guard: a hub user makes the pair step quadratic in ITS
    // list alone; at real scale cap or pre-sample instead of failing
    val maxDeg = inc.groupBy(col("u")).agg(count(lit(1)).as("d"))
      .agg(coalesce(max(col("d")), lit(0L))).head().getLong(0)
    require(maxDeg <= maxItemsPerUser,
      s"user with $maxDeg items exceeds maxItemsPerUser=$maxItemsPerUser")
    val n = inc.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val pairs = inc.as("x").join(inc.as("y"),
        col("x.u") === col("y.u") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("cooc"))
      .where(col("cooc") >= minCooc)
    pairs
      .join(n.select(col("item").as("item_a"), col("n").as("n_a")), "item_a")
      .join(n.select(col("item").as("item_b"), col("n").as("n_b")), "item_b")
      .withColumn("cos2_e12",
        expr("cooc * cooc * 1000000000000 div (n_a * n_b)"))
      .select(col("item_a"), col("item_b"), col("cooc"), col("n_a"),
        col("n_b"), col("cos2_e12"))
  }
}
