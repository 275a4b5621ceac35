package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Target (mean) encoding of a categorical feature — the standard
  * high-cardinality categorical→numeric transform for tabular training
  * data (Micci-Barreca 2001, "A preprocessing scheme for high-cardinality
  * categorical attributes"). Two leakage disciplines ride together:
  *
  *  - LEAVE-ONE-OUT: each row's own target is excluded from its
  *    category mean — enc = (Σ_cat − own)/(n_cat − 1) — so the encoding
  *    never memorizes the row it will train on (singleton categories
  *    yield NULL: there is nothing to encode them with).
  *  - PRIOR SMOOTHING: the category mean shrinks toward the global mean
  *    with pseudo-count weight w — the empirical-Bayes guard against
  *    tiny categories: smooth = (Σ_cat − own + w·ȳ)/(n_cat − 1 + w).
  *
  * Exactness: targets are integer units (cents); the global mean stays
  * the exact rational gNum/gDen and every encoding is one e6-truncated
  * integer division over cross-multiplied terms, so per-row codes
  * hash-gate cross-engine:
  *   loo_e6    = (Σ−own)·1e6 div (n−1)
  *   smooth_e6 = ((Σ−own)·gDen + w·gNum)·1e6 div ((n−1+w)·gDen)
  *
  * Scale shape: ONE hash aggregate builds the category table (bounded by
  * category cardinality, the small side by construction), broadcast back
  * onto the scan — the per-row encode is a codegen'd projection with no
  * second shuffle. The global mean is a one-row aggregate cross-joined
  * onto the (already tiny) broadcast side, so no driver collect. */
object TargetEncode {

  def looMeanE6(df: DataFrame, catCol: String, targetCol: String,
      priorWeight: Long = 20L): DataFrame = {
    require(priorWeight >= 0)
    val base = df.withColumn("__y", col(targetCol).cast("long"))
      .where(col("__y").isNotNull)
    val cats = base.groupBy(col(catCol))
      .agg(sum(col("__y")).as("__sum"), count(lit(1)).as("__n"))
    // exact global mean as a rational, riding every broadcast row
    val g = cats.agg(sum(col("__sum")).as("__gnum"), sum(col("__n")).as("__gden"))
    base
      .join(broadcast(cats.crossJoin(broadcast(g))), Seq(catCol))
      .withColumn("loo_e6",
        when(col("__n") > 1, expr(
          """CAST(CAST((__sum - __y) AS DECIMAL(38,0)) * 1000000
            |  div CAST(__n - 1 AS DECIMAL(38,0)) AS BIGINT)"""
            .stripMargin)))
      .withColumn("smooth_e6", expr(
        s"""CAST((CAST(__sum - __y AS DECIMAL(38,0)) * __gden +
           |  CAST($priorWeight AS DECIMAL(38,0)) * __gnum) * 1000000
           |  div (CAST(__n - 1 + $priorWeight AS DECIMAL(38,0)) * __gden)
           |  AS BIGINT)""".stripMargin))
      .drop("__y", "__sum", "__n", "__gnum", "__gden")
  }

  /** Weight-of-evidence encoding + information value — the
    * credit-scoring categorical transform (Siddiqi 2006, "Credit Risk
    * Scorecards" §6): per category,
    *   woe = ln( ((pos+0.5)/tot_pos) / ((neg+0.5)/tot_neg) )
    * (+0.5 is the standard adjusted-WoE smoothing: zero-count cells stay
    * finite), and the category's information-value term
    *   iv = (pos/tot_pos − neg/tot_neg) · woe
    * whose sum over categories is the feature's IV — the screening
    * statistic (<0.02 useless, >0.3 strong) feature pipelines rank
    * candidate columns by.
    *
    * Pinned double pipeline (mirrored literally in the q329 oracle):
    *   woe_e6 = round(ln(((pos+0.5)·tn) / ((neg+0.5)·tp)) · 1e6)
    *   iv_e6  = round((pos/tp − neg/tn) · woe · 1e6)
    * with every division a double division in exactly this association
    * order. Assumes both classes occur somewhere (tp, tn > 0) — the
    * usual precondition for the statistic to mean anything.
    *
    * Scale shape: ONE hash aggregate bounded by category cardinality,
    * one-row totals cross-joined onto it — nothing row-scaled leaves the
    * scan, no second shuffle. */
  def woeIv(df: DataFrame, catCol: String, posCond: Column): DataFrame = {
    val c = df.groupBy(col(catCol).as("cat"))
      .agg(sum(when(posCond, 1L).otherwise(0L)).as("pos"),
        sum(when(posCond, 0L).otherwise(1L)).as("neg"))
    val t = c.agg(sum(col("pos")).as("tp"), sum(col("neg")).as("tn"))
    val woe = log(((col("pos") + lit(0.5)) * col("tn")) /
      ((col("neg") + lit(0.5)) * col("tp")))
    c.crossJoin(broadcast(t))
      .select(col("cat"), col("pos"), col("neg"),
        round(woe * lit(1000000.0)).cast("long").as("woe_e6"),
        round((col("pos") / col("tp") - col("neg") / col("tn")) * woe *
          lit(1000000.0)).cast("long").as("iv_e6"))
  }
}
