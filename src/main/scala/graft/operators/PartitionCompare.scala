package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Adjusted Rand Index between two partitions of the same units
  * (Hubert & Arabie 1985) — chance-corrected pair-level agreement:
  * "do two clusterings / labelings carve the corpus the same way",
  * the PARTITION-agreement member of the agreement family (κ/α agree
  * on labels per item; ARI agrees on the grouping structure itself,
  * label names irrelevant). 1 = identical partitions, ~0 = chance,
  * negative = worse than chance.
  *
  * Exact integer form via DOUBLED pair counts Q(x) = x·(x−1) (so no
  * halves appear), clearing the C(n,2) denominator:
  *
  *   num = Qn·ΣQ(n_ij) − ΣQ(a_i)·ΣQ(b_j)
  *   den = Qn·(ΣQ(a_i) + ΣQ(b_j)) / 2 − ΣQ(a_i)·ΣQ(b_j)
  *   ari_e6 = num·1e6 div den     (truncating TOWARD ZERO — num may
  *                                 be negative; DECIMAL path matches
  *                                 HUGEINT `//`)
  *
  * (the /2 is exact: each Q is even). NULL when den = 0 (both
  * partitions trivial — all-singletons or one block).
  *
  * Scale shape: ONE hash aggregate to the (labelA × labelB)
  * contingency census (bounded by the label-domain product), two
  * margin aggregates of that census, single-row arithmetic. Nothing
  * pairwise over units — the pair counts are closed forms.
  */
object PartitionCompare {

  def adjustedRandE6(df: DataFrame, labelA: Column,
      labelB: Column): DataFrame = {
    val cont = df.select(labelA.as("la"), labelB.as("lb"))
      .where(col("la").isNotNull && col("lb").isNotNull)
      .groupBy(col("la"), col("lb"))
      .agg(count(lit(1)).as("nij"))
      .truncate(true) // three census consumers below
    val d = (c: Column) => c.cast("decimal(38,0)")
    val cells = cont.agg(sum(col("nij")).as("n"),
      sum(d(col("nij")) * (col("nij") - 1)).as("sq_ij"))
    val rows = cont.groupBy(col("la")).agg(sum(col("nij")).as("ai"))
      .agg(sum(d(col("ai")) * (col("ai") - 1)).as("sq_a"))
    val cols = cont.groupBy(col("lb")).agg(sum(col("nij")).as("bj"))
      .agg(sum(d(col("bj")) * (col("bj") - 1)).as("sq_b"))
    cells.crossJoin(broadcast(rows)).crossJoin(broadcast(cols))
      .withColumn("__qn", expr("CAST(n AS DECIMAL(38,0)) * (n - 1)"))
      .withColumn("__num", expr("__qn * sq_ij - sq_a * sq_b"))
      // Q sums are even, so /2 is exact; the cast pins the scale back
      // to (38,0) without rounding
      .withColumn("__den",
        expr("""CAST(__qn * (sq_a + sq_b) / 2 AS DECIMAL(38,0))
              | - sq_a * sq_b""".stripMargin))
      .select(col("n"), col("sq_ij"), col("sq_a"), col("sq_b"),
        when(col("__den") =!= 0L, expr(
          """CASE WHEN __num >= 0
            | THEN CAST((__num * 1000000 - pmod(__num * 1000000, __den))
            |   / __den AS BIGINT)
            | ELSE -CAST((-(__num * 1000000)
            |   - pmod(-(__num * 1000000), __den)) / __den AS BIGINT)
            |END""".stripMargin)).as("ari_e6"))
  }
}
