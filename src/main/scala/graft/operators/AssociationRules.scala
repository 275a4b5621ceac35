package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant 1994, the A-priori
  * support/confidence frame plus Brin et al. 1997's lift) over a
  * (basket, item) relation, restricted to size-2 itemsets — the rule
  * family recommendation and data-audit pipelines actually ship.
  *
  * All metrics are exact integers: support is a basket count,
  * confidence and lift are ppm via integer `div`, so the oracle can
  * replay them bit-for-bit.
  *
  * Scale shape: pair generation is a self-equi-join on the basket key —
  * the shuffle is sized by Σ c_b·(c_b−1) over basket sizes c_b, which a
  * `maxBasketSize` cap keeps near-linear (hub baskets contribute
  * quadratically and are exactly the rows a recommender discards
  * anyway). Item supports are a second aggregate over the deduplicated
  * relation; the final rule join keys on single items against the
  * (small) item-support table, which Spark broadcasts.
  */
object AssociationRules {

  /** Directional rules A→B with basket-count support ≥ `minSupport`.
    *
    * Output: antecedent, consequent, support (baskets with both),
    * antecedent_support, confidence_ppm = 1e6·s(A,B) div s(A),
    * lift_ppm = 1e6·s(A,B)·N div (s(A)·s(B)).
    *
    * Baskets larger than `maxBasketSize` distinct items are dropped
    * whole (standard hub guard — quadratic pair blowup at scale).
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketSize: Int = 200): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val sized = bi.groupBy(col("b"))
      .agg(count(lit(1)).as("bs"))
      .where(col("bs") <= maxBasketSize)
      .select(col("b"))
    // kept feeds the basket count, the item census and BOTH sides of
    // the pair join — persist once (materialized by the count below)
    // instead of re-deriving the dedup+hub-guard chain per consumer
    // (r15 optimization round)
    val kept = bi.join(sized, "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = kept.select(col("b")).distinct().count()
    val itemSupp = kept.groupBy(col("i"))
      .agg(count(lit(1)).as("supp"))
    val pairSupp = kept.as("x")
      .join(kept.as("y"),
        col("x.b") === col("y.b") && col("x.i") =!= col("y.i"))
      .groupBy(col("x.i").as("antecedent"), col("y.i").as("consequent"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    pairSupp
      .join(itemSupp.withColumnRenamed("i", "antecedent")
        .withColumnRenamed("supp", "antecedent_support"), "antecedent")
      .join(itemSupp.withColumnRenamed("i", "consequent")
        .withColumnRenamed("supp", "consequent_support"), "consequent")
      .select(col("antecedent"), col("consequent"), col("support"),
        col("antecedent_support"),
        expr("1000000 * support div antecedent_support")
          .as("confidence_ppm"),
        // 1e6·s·N stays within Long while s·N < 9.2e12 — beyond that,
        // compute lift over per-partition-date strata instead.
        expr(s"1000000 * support * ${n}L div " +
          "(antecedent_support * consequent_support)").as("lift_ppm"))
  }

  /** Frequent itemsets of size 3 via A-priori level-wise pruning
    * (Agrawal & Srikant, VLDB 1994): only baskets' FREQUENT items form
    * pairs, only frequent (i₁<i₂) pair occurrences extend to a third
    * item, and the (i₂,i₃) leg is semi-checked against F₂ before the
    * final count — the downward-closure property means no frequent
    * triple is lost, while the candidate stream shrinks at every level
    * (the point at 100 TB: the k-th level's join input is the (k−1)-th
    * level's SURVIVORS inside each basket, not the raw basket cross).
    * Same dedup + hub-basket guard as [[rules]]. Output:
    * (i1, i2, i3, support) with i1 < i2 < i3, support ≥ minSupport. */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketSize: Int = 200): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val sized = bi.groupBy(col("b"))
      .agg(count(lit(1)).as("bs")).where(col("bs") <= maxBasketSize)
      .select(col("b"))
    val kept = bi.join(sized, "b")
    val f1 = kept.groupBy(col("i")).agg(count(lit(1)).as("s1"))
      .where(col("s1") >= minSupport).select(col("i"))
    val k1 = kept.join(f1, Seq("i"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NOT persisted (r15 optimization round, measured-and-rejected):
    // caching the exploded level-2 stream cost more than re-deriving
    // it from the cached k1 (isolated reps=2: 4.2 s vs 3.1 s warm) —
    // the self-join is cheap next to materializing its output.
    val pairs = k1.as("x").join(k1.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .select(col("x.b").as("b"), col("x.i").as("i1"), col("y.i").as("i2"))
    val f2 = pairs.groupBy(col("i1"), col("i2"))
      .agg(count(lit(1)).as("s2")).where(col("s2") >= minSupport)
      .select(col("i1"), col("i2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.join(f2, Seq("i1", "i2"), "left_semi")
      .join(k1.as("z").select(col("b"), col("i").as("i3")), Seq("b"))
      .where(col("i3") > col("i2"))
      .join(f2.select(col("i1").as("i2"), col("i2").as("i3")),
        Seq("i2", "i3"), "left_semi")
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
