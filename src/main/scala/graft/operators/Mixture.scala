package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** DoReMi-shape data-mixture reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining"),
  * reduced to its count-based core: a domain's EXCESS LOSS under the
  * pooled reference model is the per-token KL(P_d ‖ Q) of the domain's
  * unigram distribution against the corpus distribution — the loss gap
  * between the shared reference model and the best domain-specific one
  * (DoReMi's Group-DRO signal, with the trained proxy replaced by the
  * exact count-based optimum) — and the mixture weights follow
  * multiplicative-weights rounds that boost high-excess (hard,
  * under-served) domains.
  *
  * Exact-integer discipline:
  *   excess_e6(d) = max(0, Σ_v round((c/ng)·ln((c/ng)/(cc/n))·1e6))
  *     — per-cell ONE pinned double chain rounded to micro-nats BEFORE
  *     summation (the q357/q374 rule), clamped at 0 (KL ≥ 0; per-term
  *     truncation can drift a few micro-nats negative).
  *   w⁰_d = 1_000_000 div D                      (uniform, truncating)
  *   round t:  f_d  = 1_000_000 + (etaE6·excess_e6(d)) div 1_000_000
  *             w'_d = w_d · f_d div 1_000_000    (linearized Hedge)
  *             w_d  = w'_d · 1_000_000 div Σ w'_d
  *     — all LONG/DECIMAL(38,0); the LINEARIZED update keeps every
  *     round rational (no exp), so the oracle unrolls rounds as plain
  *     CTEs with HUGEINT `//` and the output hash-gates cross-engine.
  *
  * Scale shape: ONE hash aggregate collapses the corpus to (domain,
  * value) census grain — the only data-scale pass; the corpus census
  * re-aggregates it; totals ride broadcast one-row frames; the update
  * rounds run on the DOMAIN frame (|D| rows, localCheckpointed per
  * round), never on tokens. */
object Mixture {

  def doremiWeightsE6(df: DataFrame, domainCol: Column, valueCol: Column,
      rounds: Int, etaE6: Long): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"Mixture.doremiWeightsE6: need 1 ≤ rounds ≤ 16, got $rounds")
    require(etaE6 > 0L && etaE6 <= 10000000L,
      s"Mixture.doremiWeightsE6: need 0 < etaE6 ≤ 1e7, got $etaE6")
    val cells = df.select(domainCol.as("d"), valueCol.as("v"))
      .where(col("d").isNotNull && col("v").isNotNull)
      .groupBy(col("d"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = cells.groupBy(col("v")).agg(sum(col("c")).as("cc"))
    val ng = cells.groupBy(col("d")).agg(sum(col("c")).as("ng"),
      count(lit(1)).as("n_values"))
    val nTotal = broadcast(corpus.agg(
      coalesce(sum(col("cc")), lit(0L)).as("n")))
    val excess = cells
      .join(corpus, "v").join(ng.select(col("d"), col("ng")), "d")
      .crossJoin(nTotal)
      .select(col("d"),
        round((col("c").cast("double") / col("ng").cast("double")) *
          log((col("c").cast("double") / col("ng").cast("double")) /
            (col("cc").cast("double") / col("n").cast("double"))) *
          lit(1000000.0)).cast("long").as("t"))
      .groupBy(col("d"))
      .agg(sum(col("t").cast("decimal(38,0)")).as("kl"))
      .select(col("d"), expr(
        "CAST(greatest(CAST(0 AS DECIMAL(38,0)), kl) AS BIGINT)")
        .as("excess_e6"))
    val dom = ng.join(excess, "d").crossJoin(nTotal)
      .select(col("d"), col("ng"), col("n_values"),
        expr("CAST(CAST(ng AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("share_e6"),
        col("excess_e6"))
      .truncate(true)
    cells.unpersist()
    // domains are FEW by contract (the mixture is over sources/shards,
    // not rows) — the rounds loop collapses to |D|-row frames, and a
    // data-grain "domain" column would make the loop itself the scan
    val dCount = dom.count()
    require(dCount >= 1 && dCount <= 100000,
      s"Mixture.doremiWeightsE6: $dCount domains — the mixture frame " +
        "must be domain-grain (≤ 1e5), not data-grain")
    var w = dom.withColumn("w_e6", lit(1000000L / dCount))
    for (_ <- 1 to rounds) {
      val boosted = w.withColumn("wp", expr(
        s"""CAST(CAST(w_e6 AS DECIMAL(38,0))
           | * (1000000 + (($etaE6 * excess_e6) div 1000000))
           | div 1000000 AS BIGINT)""".stripMargin))
      val tot = boosted.agg(
        sum(col("wp").cast("decimal(38,0)")).as("tw"))
      w = boosted.crossJoin(broadcast(tot))
        .select(col("d"), col("ng"), col("n_values"), col("share_e6"),
          col("excess_e6"),
          expr("CAST(CAST(wp AS DECIMAL(38,0)) * 1000000 div tw AS BIGINT)")
            .as("w_e6"))
        .truncate(true)
    }
    w.select(col("d").as("domain"), col("n_values"),
      col("ng").as("n_tokens"), col("share_e6"), col("excess_e6"),
      col("w_e6"))
  }

  /** UniMax epoch-capped budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): spread a total token budget B as
    * UNIFORMLY as possible across domains, subject to the per-domain
    * repeat cap b_d ≤ cap_d = n_d · maxEpochsE6 div 1e6 — the
    * allocation that never over-epochs a small domain while the big
    * ones absorb the slack. The classic water-filling solution, exact
    * in integers:
    *
    *   sort domains by (cap, domain) ascending with 1-based rank i,
    *   prefix sums S_i = Σ_{j≤i} cap_j;
    *   domain i is CAPPED  ⟺  S_i + cap_i·(n−i) ≤ B
    *     (the predicate is monotone in i — (n−i)·(cap_{i+1}−cap_i) ≥ 0 —
    *      so capped domains form a prefix of the sort);
    *   K capped, R = B − S_K, m = n − K uncapped:
    *     b_d = cap_d                     (capped)
    *     b_d = R div m (+1 for the first R mod m uncapped domains in
    *           sort order — the pinned remainder rule)   (uncapped)
    *   K = n ⇒ every domain runs its full cap and B − S_n stays
    *   unallocated (the corpus is exhausted at the epoch cap).
    *
    * Proof obligation carried by the sort: for any uncapped domain,
    * cap > R/m ≥ base, so base (+1) never exceeds its cap.
    *
    * Output per domain: (domain, n_tokens, cap_tokens, alloc_tokens,
    * epochs_e6 = alloc·1e6 div n_tokens, budget_share_e6 =
    * alloc·1e6 div B) — all truncating integer chains; hash-gates
    * cross-engine.
    *
    * Scale shape: ONE hash aggregate collapses the corpus to domain
    * grain (the only data-scale pass, the [[doremiWeightsE6]]
    * contract with the same loud ≤ 1e5 grain guard); the waterfill is
    * two windows over the domain census (cumsum + rank, constant
    * [[Census.onePartKey]] partition) plus scalar projections —
    * no driver fold, no iteration. */
  /** Temperature-sampled mixture weights — the multilingual-pretraining
    * standard between proportional and uniform (Xue et al. 2021 mT5
    * §3.1's α-scaled sampling; Raffel et al. 2020 T5 uses the same
    * form): sampling weight w_i ∝ n_i^α with 0 < α ≤ 1 — α = 1 is
    * proportional, α → 0 is uniform, α ≈ 0.3–0.5 is the shipped range
    * that up-samples low-resource domains without flattening the mix.
    * Sits beside [[doremiWeightsE6]] (learned reweighting) and
    * [[unimaxAllocationE6]] (epoch-capped budget) as the third shipped
    * allocator.
    *
    * Exactness: ONE pow+round per domain — q_i_e6 = round(n_i^α · 1e6)
    * (the q374 pinned-double-chain precedent; the α literal is written
    * `alphaE6 / 1000000.0` in BOTH engines) — then every downstream
    * number is exact integer arithmetic on the q census: no double is
    * ever summed, so the normalization cannot drift with domain order.
    * samp_e6 = q_i·1e6 div Σq, share_e6 = n_i·1e6 div Σn, boost_e6 =
    * samp·1e6 div share (the up/down-sampling factor vs proportional).
    *
    * Scale shape: ONE hash aggregate to the domain census (≤ 1e5 loud
    * grain guard, the [[unimaxAllocationE6]] contract) + a broadcast
    * scalar total; counted max-n guard keeps round(n^α·1e6) inside
    * LONG. */
  def temperatureWeightsE6(df: DataFrame, domainCol: Column,
      alphaE6: Long): DataFrame = {
    require(alphaE6 >= 1L && alphaE6 <= 1000000L,
      s"Mixture.temperatureWeightsE6: need 1 ≤ alphaE6 ≤ 1e6, got $alphaE6")
    val census = df.select(domainCol.as("d"))
      .where(col("d").isNotNull)
      .groupBy(col("d")).agg(count(lit(1)).as("nd"))
      .truncate(true)
    val dCount = census.count()
    require(dCount >= 1 && dCount <= 100000,
      s"Mixture.temperatureWeightsE6: $dCount domains — the weight " +
        "frame must be domain-grain (≤ 1e5), not data-grain")
    val maxNd = census.agg(max(col("nd"))).head().getLong(0)
    require(maxNd <= 4000000000000L,
      s"Mixture.temperatureWeightsE6: domain of $maxNd items overflows " +
        "the e6-scaled pow (need n ≤ 4e12); pre-aggregate to coarser units")
    val q = census.withColumn("q_e6", expr(
      s"CAST(round(pow(CAST(nd AS DOUBLE), $alphaE6 / 1000000.0)" +
        " * 1000000.0) AS BIGINT)"))
    val totals = broadcast(q.agg(
      sum(col("nd")).cast("decimal(38,0)").as("sn"),
      sum(col("q_e6")).cast("decimal(38,0)").as("sq")))
    q.crossJoin(totals)
      .select(col("d").as("domain"), col("nd").as("n_tokens"),
        expr("CAST(nd AS DECIMAL(38,0)) * 1000000 div sn").as("share_e6"),
        expr("CAST(q_e6 AS DECIMAL(38,0)) * 1000000 div sq").as("samp_e6"))
      .withColumn("boost_e6",
        when(col("share_e6") > 0L,
          expr("CAST(samp_e6 AS DECIMAL(38,0)) * 1000000 div share_e6"))
          .otherwise(0L))
  }

  def unimaxAllocationE6(df: DataFrame, domainCol: Column, budget: Long,
      maxEpochsE6: Long): DataFrame = {
    require(budget >= 1L,
      s"Mixture.unimaxAllocationE6: need budget ≥ 1, got $budget")
    require(maxEpochsE6 >= 1L && maxEpochsE6 <= 1000000000L,
      s"Mixture.unimaxAllocationE6: need 1 ≤ maxEpochsE6 ≤ 1e9, " +
        s"got $maxEpochsE6")
    val census = df.select(domainCol.as("d"))
      .where(col("d").isNotNull)
      .groupBy(col("d")).agg(count(lit(1)).as("nd"))
      .truncate(true)
    val dCount = census.count()
    require(dCount >= 1 && dCount <= 100000,
      s"Mixture.unimaxAllocationE6: $dCount domains — the allocation " +
        "frame must be domain-grain (≤ 1e5), not data-grain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Census.onePartKey(col("d")))
      .orderBy(col("cap"), col("d"))
    val ranked = census
      .withColumn("cap", expr(
        s"CAST(CAST(nd AS DECIMAL(38,0)) * $maxEpochsE6 div 1000000" +
          " AS DECIMAL(38,0))"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s_i", sum(col("cap")).over(w))
      .withColumn("capped", expr(
        s"s_i + cap * (${dCount}L - i) <= CAST($budget AS DECIMAL(38,0))"))
    val kFrame = broadcast(ranked.agg(
      coalesce(sum(when(col("capped"), 1L)), lit(0L)).as("k"),
      coalesce(sum(when(col("capped"), col("cap"))),
        expr("CAST(0 AS DECIMAL(38,0))")).as("s_k")))
    ranked.crossJoin(kFrame)
      .select(col("d"), col("nd"), col("cap"), col("i"), col("k"),
        expr(s"CAST($budget AS DECIMAL(38,0)) - s_k").as("r"),
        lit(dCount).as("n"))
      .withColumn("alloc", expr(
        """CASE WHEN i <= k THEN cap
          | ELSE r div (n - k)
          |  + (CASE WHEN i - k <= r % (n - k) THEN 1 ELSE 0 END)
          | END""".stripMargin))
      .select(col("d").as("domain"), col("nd").as("n_tokens"),
        expr("CAST(cap AS BIGINT)").as("cap_tokens"),
        expr("CAST(alloc AS BIGINT)").as("alloc_tokens"),
        expr("CAST(CAST(alloc AS DECIMAL(38,0)) * 1000000 div nd" +
          " AS BIGINT)").as("epochs_e6"),
        expr(s"CAST(CAST(alloc AS DECIMAL(38,0)) * 1000000 div $budget" +
          " AS BIGINT)").as("budget_share_e6"))
  }
}
