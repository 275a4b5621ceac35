package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the gate a production ANN index must
  * pass before it replaces exact search (IVF/PQ recall audits run on
  * every index rebuild; reference analogue: the delivery-log join audits
  * that compare inferred joins against the full join, SURVEY §2.4).
  *
  * Both metrics are decided in exact integers so the audit itself
  * hash-gates: recall as parts-per-million of the truth set recovered,
  * MRR as round-free `1e6 div rank`, NDCG against a literal discount
  * table ([[ndcgWeightsE9]]) shared verbatim with the SQL oracle — no
  * float log2 in either engine's hot path.
  *
  * Shape at 100 TB: both sides arrive as (query, candidate) id pair
  * frames (tiny relative to the corpus scans that produced them); the
  * audit is one hash join on the query key + one aggregation — the cost
  * lives in the retrieval stages being audited, never in the audit. */
object RankEval {

  /** e9-scaled NDCG discount weights: w(r) = round(1e9 / log2(r+1)).
    * Computed once on the driver and inlined as plan literals; the SQL
    * oracle embeds the SAME longs, so both engines sum identical
    * integers. */
  def ndcgWeightsE9(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))

  /** Per-query recall@k: how much of the exact `truth` top-k the
    * `candidates` ranking recovered. Inputs are id-pair frames
    * (queryCol, idCol); output one row per truth query:
    * (queryCol, n_true, hits, recall_ppm). Queries the candidate side
    * dropped entirely still appear (hits = 0) — a silent-miss audit
    * must count the silence. */
  def recallAtK(truth: DataFrame, candidates: DataFrame,
      queryCol: String, idCol: String): DataFrame = {
    val t = truth.select(col(queryCol).as("qid"), col(idCol).as("cid"))
    val c = candidates.select(col(queryCol).as("qid"), col(idCol).as("cid"),
      lit(1L).as("hit"))
    t.join(c, Seq("qid", "cid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(col("hit")), lit(0L)).as("hits"))
      .withColumn("recall_ppm", expr("hits * 1000000 div n_true"))
      .select(col("qid").as(queryCol), col("n_true"), col("hits"),
        col("recall_ppm"))
  }

  /** Per-query MRR + NDCG@k of a ranked candidate list against binary
    * truth-set membership. `ranked` carries (queryCol, idCol, rankCol)
    * with rank 1-based and ≤ k; `truth` is the relevant id set per
    * query. Output per truth query: (queryCol, n_true, first_hit_rank
    * (0 = none), rr_e6 = 1e6 div rank, dcg_e9, ideal_e9, ndcg_ppm).
    * ideal = the best achievable DCG: min(n_true, k) top discount
    * weights. */
  def rankMetrics(truth: DataFrame, ranked: DataFrame, queryCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k=$k out of supported range")
    val w = ndcgWeightsE9(k)
    // rank → weight as a literal CASE chain (k terms, codegen'd)
    val weightOf = (1 to k).foldLeft(lit(0L)) { (acc, r) =>
      when(col("rank") === r, lit(w(r - 1))).otherwise(acc)
    }
    // prefix sums of the weight table for the ideal DCG lookup
    val prefix = w.scanLeft(0L)(_ + _).tail
    val idealOf = (1 to k).foldLeft(lit(0L)) { (acc, m) =>
      when(col("n_true") >= m, lit(prefix(m - 1))).otherwise(acc)
    }
    val t = truth.select(col(queryCol).as("qid"), col(idCol).as("cid"))
    val r = ranked.select(col(queryCol).as("qid"), col(idCol).as("cid"),
      col(rankCol).cast("long").as("rank"))
    t.join(r, Seq("qid", "cid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        coalesce(min(col("rank")), lit(0L)).as("first_hit_rank"),
        coalesce(sum(when(col("rank").isNotNull, weightOf)), lit(0L))
          .as("dcg_e9"))
      .withColumn("rr_e6",
        when(col("first_hit_rank") > 0,
          expr("1000000 div first_hit_rank")).otherwise(lit(0L)))
      .withColumn("ideal_e9", idealOf)
      .withColumn("ndcg_ppm", expr("dcg_e9 * 1000000 div ideal_e9"))
      .select(col("qid").as(queryCol), col("n_true"), col("first_hit_rank"),
        col("rr_e6"), col("dcg_e9"), col("ideal_e9"), col("ndcg_ppm"))
  }

  /** Reciprocal-rank fusion (Cormack–Clarke–Büttcher 2009) — the hybrid
    * retrieval combiner (BM25 ⊕ dense ANN is the production pairing):
    * each source ranking contributes 1e6 div (kConst + rank) and the
    * integer sums re-rank. Exact by construction — RRF only reads
    * RANKS, so heterogeneous score scales never meet.
    *
    * Shape: a union of narrow (id, rank) frames → one counting
    * aggregation → one total-ordered window over the fused census.
    * Output: (id, n_sources, rrf_e6, rrf_rank), ties (rrf_e6, then id)
    * totalized. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Long = 60L): DataFrame = {
    require(rankings.nonEmpty && kConst >= 0)
    val parts = rankings.map(_.select(col(idCol).as("id"),
      col(rankCol).cast("long").as("rank")))
    val fused = parts.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sources"),
        sum(expr(s"1000000 div (${kConst}L + rank)")).as("rrf_e6"))
    fused.withColumn("rrf_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(Census.onePartKey(col("rrf_e6")))
            .orderBy(col("rrf_e6").desc, col("id"))).cast("long"))
      .select(col("id").as(idCol), col("n_sources"), col("rrf_e6"),
        col("rrf_rank"))
  }

  /** e6-scaled prefix-bounded rank-biased-overlap tail weights for
    * persistence p = 9/10: W(m) = Σ_{d=m..k} (9^{d−1}·1e6) div (d·10^{d−1})
    * — an item whose worse rank across the two lists is m contributes to
    * every depth-d agreement term with d ≥ m, so its total weight is the
    * tail sum. Pure-integer per-d truncation, computed once on the driver
    * and inlined as plan literals shared verbatim with the SQL oracle.
    * k ≤ 14 keeps 9^{d−1}·1e6 inside BIGINT. */
  def rboTailWeightsE6(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 14, s"k=$k out of supported range")
    val perDepth = (1 to k).map { d =>
      var num = 1000000L
      var den = 1L
      var i = 1
      while (i < d) { num *= 9L; den *= 10L; i += 1 }
      num / (d.toLong * den)
    }
    (1 to k).map(m => perDepth.drop(m - 1).sum)
  }

  /** Per-query rank-biased overlap (Webber, Moffat & Zobel 2010, "A
    * similarity measure for indefinite rankings" — public result) between
    * two top-k id rankings, the list-similarity audit that compares an
    * approximate index's ORDER (not just membership, which recall@k
    * already gates) against exact search: top-weighted, so disagreement
    * at rank 1 costs more than at rank k.
    *
    * RBO_min = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d with p = 9/10,
    * decided entirely in integers: each co-retrieved id contributes the
    * literal tail weight [[rboTailWeightsE6]](max(rankA, rankB)), the sum
    * takes one final `div 10` for the (1−p) factor. Queries `a` retrieved
    * but `b` lost entirely surface with rbo_e6 = 0.
    *
    * Scale: both inputs are (query, id, rank) audit frames; one equi hash
    * join + one aggregation — the audit never touches the corpus.
    * Output: (queryCol, n_common, rbo_e6). */
  def rboMinE6(a: DataFrame, b: DataFrame, queryCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    val w = rboTailWeightsE6(k)
    val wCase = (1 to k).map(m => s"WHEN $m THEN ${w(m - 1)}L")
      .mkString("CASE greatest(ra, rb) ", " ", " ELSE 0L END")
    val ar = a.select(col(queryCol).as("qid"), col(idCol).as("cid"),
      col(rankCol).cast("long").as("ra"))
    val br = b.select(col(queryCol).as("qid"), col(idCol).as("cid"),
      col(rankCol).cast("long").as("rb"))
    val matched = ar.join(br, Seq("qid", "cid"))
      .where(col("ra") <= k && col("rb") <= k)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_common"), sum(expr(wCase)).as("wsum"))
    ar.select(col("qid")).distinct()
      .join(matched, Seq("qid"), "left")
      .select(col("qid").as(queryCol),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("coalesce(wsum, 0L) div 10").as("rbo_e6"))
  }
}
