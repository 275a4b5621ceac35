package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two samples of one metric — the
  * Population Stability Index report every production feature pipeline
  * runs between a reference window (training corpus, last week) and a
  * target window (serving traffic, this week).
  *
  * PSI = Σ_bins (p_t − p_r)·ln(p_t / p_r), over bins derived from the
  * REFERENCE distribution's exact equi-depth cuts
  * ([[ExactQuantiles.equiDepthCuts]] — no global sort), so a stationary
  * target scores ≈ 0 by construction and the per-bin terms localize
  * WHERE the mass moved. Industry reading: < 0.1 stable, 0.1–0.25 drift
  * worth a look, > 0.25 action.
  *
  * Determinism discipline: bin assignment is the integer collapse-left
  * fold; each bin's term follows ONE pinned double pipeline
  * (p = n/N as a double divide, floored at 1e-6 — the standard
  * zero-count guard — then (p_t−p_r)·ln(p_t/p_r)) and rounds to integer
  * micro-units BEFORE any summation (the no-raw-double-SUM rule), so the
  * report hash-gates cross-engine.
  *
  * Cost: the reference quantile scans + one counting aggregation per
  * side (map-side combine, `buckets` groups out) + a buckets-row join.
  * Nothing corpus-sized shuffles. Output: (bucket, n_ref, n_tgt,
  * psi_term_e6) — callers sum psi_term_e6 for the headline number. */
object Drift {

  def psiBins(ref: DataFrame, target: DataFrame, value: Column,
      rowKey: Column, buckets: Int, k: Int = 4096): DataFrame = {
    val cuts = ExactQuantiles.equiDepthCuts(ref, value, rowKey, buckets, k)
    val bin = ExactQuantiles.binColumn(cuts, value)
    def counts(df: DataFrame, as: String) = df.select(bin.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val nr = ref.count()
    val nt = target.count()
    require(nr > 0 && nt > 0, "both samples must be non-empty")
    val joined = counts(ref, "n_ref")
      .join(counts(target, "n_tgt"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"))
    // pinned double pipeline, mirrored in the oracle SQL
    val pr = greatest(col("n_ref").cast("double") / lit(nr.toDouble), lit(1e-6))
    val pt = greatest(col("n_tgt").cast("double") / lit(nt.toDouble), lit(1e-6))
    joined.select(col("bucket"), col("n_ref"), col("n_tgt"),
      round((pt - pr) * log(pt / pr) * lit(1000000.0)).cast("long")
        .as("psi_term_e6"))
  }
}
