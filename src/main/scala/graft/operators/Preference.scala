package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair rating aggregation — the batch op that turns raw
  * pairwise comparisons ("A beat B") into per-item strength ratings, the
  * workhorse of preference-data curation for reward-model / RLHF
  * training sets (which responses are strong? which annotator pairs are
  * inconsistent? what to oversample?).
  *
  * Model: Bradley–Terry (Zermelo 1929; Bradley & Terry 1952) —
  * P[i beats j] = r_i / (r_i + r_j) — fit by the MM algorithm of Hunter
  * 2004 ("MM algorithms for generalized Bradley-Terry models", Annals of
  * Statistics §1): each round
  *   r_i ← W_i / Σ_{j≠i} n_ij / (r_i + r_j)
  * where W_i = total wins of i and n_ij = comparisons between i and j.
  * Each update uses only pair-level sufficient statistics, so a round is
  * ONE join of the (persisted, deduped) pair-count frame with the rating
  * frame + one partial-sum aggregate — the pageRankE9 round shape; no
  * per-item loops, no raw comparison rows after the first aggregation.
  *
  * Integer fixed-point discipline (hash-gates cross-engine): ratings live
  * in e6 (1e6 = 1.0), the pair term is n_ij·1e12 div (r_i + r_j) and the
  * update W_i·1e12 div D_i, renormalized each round to max = 1e6 — all
  * truncating division on non-negative operands, so a SQL oracle replays
  * every round with `//` bit-exactly. Ratings clamp to ≥ 1 (a zero-win
  * item's MLE is 0; the clamp keeps later denominators positive and the
  * fixture total), mirroring the max-norm clamp in [[Graph.hitsE6]].
  *
  * Determinism: a FIXED iteration count (not a convergence test — float
  * tolerances don't hash-gate), synchronous updates from the previous
  * round's ratings, and no order-dependence anywhere (sums are
  * commutative, renorm is a global max).
  *
  * Scale shape: comparisons collapse to (pair → n) once (map-side
  * combine); every round shuffles |pairs| rows for the term sum and
  * |items| for the update — at 100 TB of raw comparisons the iteration
  * cost depends only on the distinct-pair count. Per-round eager
  * localCheckpoint is load-bearing for the same reason as hitsE6: the
  * max-renorm embeds a scalar broadcast subquery per round and a lazy
  * nested chain of those overflows plan-tree recursion under AQE.
  *
  * Output: (item, rating_e6, wins, comparisons) for every item seen on
  * either side of any comparison.
  */
object Preference {

  def bradleyTerryE6(pairs: DataFrame, winner: Column, loser: Column,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 16)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cmp = pairs.select(winner.as("w"), loser.as("l"))
      .where(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
    // pair-level sufficient statistics: n_ab over unordered pairs
    val und = cmp.select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .persist(mem)
    val wins = cmp.groupBy(col("w").as("id")).agg(count(lit(1)).as("wins"))
    val comps = und.select(col("a").as("id"), col("n"))
      .unionByName(und.select(col("b").as("id"), col("n")))
      .groupBy(col("id")).agg(sum(col("n")).as("comparisons"))
    val items = comps.join(wins, Seq("id"), "left")
      .select(col("id"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("comparisons"))
      .persist(mem)
    var r = items.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iterations) {
      val terms = und
        .join(r.select(col("id").as("a"), col("r").as("ra")), "a")
        .join(r.select(col("id").as("b"), col("r").as("rb")), "b")
        .withColumn("t", expr("n * 1000000000000L div (ra + rb)"))
      val denom = terms.select(col("a").as("id"), col("t"))
        .unionByName(terms.select(col("b").as("id"), col("t")))
        .groupBy(col("id")).agg(sum(col("t")).as("d"))
      val raw = items.join(denom, Seq("id"))
        .select(col("id"),
          greatest(lit(1L), expr("wins * 1000000000000L div d")).as("r"))
      val m = raw.agg(max(col("r")).as("m"))
      r = raw.crossJoin(broadcast(m))
        .select(col("id"),
          greatest(lit(1L), expr("r * 1000000 div m")).as("r"))
        .localCheckpoint(true)
    }
    items.join(r, Seq("id"))
      .select(col("id").as("item"), col("r").as("rating_e6"),
        col("wins"), col("comparisons"))
  }
}
