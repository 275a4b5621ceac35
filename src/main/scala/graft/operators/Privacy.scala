package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PolyHash64

/** Privacy auditing over quasi-identifier groupings.
  *
  * k-anonymity (Sweeney 2002): every quasi-identifier (QI) combination
  * must be shared by at least k records, or the group is re-identifiable.
  * l-diversity (Machanavajjhala et al. 2007): each QI group must also
  * contain at least l distinct values of the sensitive attribute, or the
  * sensitive value leaks even when k holds (homogeneity attack).
  *
  * Scale shape: one hash aggregate over the QI columns with a partial
  * (map-side) combine; the distinct-sensitive count is Spark's standard
  * two-phase partial-distinct aggregate, so nothing materializes the
  * groups on the driver and the shuffle carries one row per
  * (QI, sensitive) pair at most. At 100 TB the QI-group space is the
  * small side — the output is bounded by the QI cardinality product,
  * not the input row count.
  */
object Privacy {

  /** Per-QI-group audit row: the group's QI values, `group_size` (k),
    * `l_diversity` (distinct sensitive values), and `violates_k`.
    * Records with a NULL sensitive value count toward k but not l.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("violates_k", col("group_size") < k)

  /** Corpus-level summary: total records, records in violating groups
    * (the suppression cost of enforcing k), and the minimum l over
    * groups that DO satisfy k (the residual homogeneity risk).
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    kAnonymityAudit(df, qiCols, sensitiveCol, k)
      .agg(sum(col("group_size")).as("n_records"),
        count(lit(1)).as("n_groups"),
        sum(when(col("violates_k"), col("group_size")).otherwise(0L))
          .as("suppressed_records"),
        sum(when(col("violates_k"), 1L).otherwise(0L))
          .as("violating_groups"),
        min(when(!col("violates_k"), col("l_diversity")))
          .as("min_l_of_k_groups"))

  /** Local-DP private histogram of a sensitive bit: randomized response
    * (Warner 1965; the RAPPOR permanent-response shape, Erlingsson et al.
    * CCS'14) with per-user contribution bounding (Wilson et al. VLDB'20,
    * "Differentially Private SQL with Bounded User Contribution").
    *
    * Mechanism, per retained row: with probability 3/4 report the true
    * bit, else report a fair coin. P[report=1 | bit=1] = 7/8 and
    * P[report=1 | bit=0] = 1/8, so the per-row privacy loss is
    * ε = ln 7 ≈ 1.95; bounding each user to `maxPerUser` rows per group
    * caps the per-user loss at `maxPerUser`·ε by basic composition.
    * The unbiased count estimator is E[R] = 3/4·T + n/8, inverted as
    * T̂ = (8R − n)/6 and clamped at 0 — emitted in integer micro-units
    * so no double ever crosses an engine boundary.
    *
    * Determinism discipline: the "coins" are PolyHash64 draws of the
    * row id under two salt domains — stable across runs, partitionings,
    * and engines (the oracle replays the KR fold + splitMix64 chain),
    * which is what makes a DP mechanism testable at all. A production
    * deployment would swap the salt for per-release entropy; everything
    * else (bounding, mechanism, debias) is the real pipeline.
    *
    * Scale shape: the contribution bound is a per-(user,group) top-k
    * ranked window — WindowGroupLimit pushes the limit below the
    * exchange, so the shuffle carries ≤ maxPerUser rows per (user,group);
    * the mechanism itself is one codegen'd scalar pass and the histogram
    * a partial-agg groupBy. Output is one row per group.
    */
  def randomizedResponse(df: DataFrame, idCol: String, userCol: String,
      groupCol: String, bit: Column, salt: String,
      maxPerUser: Int): DataFrame = {
    require(maxPerUser >= 1)
    PolyHash64.register(df.sparkSession)
    val w = Window.partitionBy(col(userCol), col(groupCol))
      .orderBy(col(idCol))
    val bounded = df
      .withColumn("__bit", bit)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerUser)
    def draw(domain: String): Column = shiftrightunsigned(
      PolyHash64.polyHash64(
        concat(col(idCol).cast("string"), lit(s"$salt#$domain"))), 13)
    val keepTrue = pmod(draw("keep"), lit(4L)) =!= 0L // p = 3/4
    val coin = pmod(draw("coin"), lit(2L)) === 1L     // fair
    bounded
      .withColumn("__rep", when(keepTrue, col("__bit")).otherwise(coin))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__rep"), 1L).otherwise(0L)).as("reported_true"),
        sum(when(col("__bit"), 1L).otherwise(0L)).as("true_count"))
      .withColumn("est_true_e6",
        expr("greatest(reported_true * 8 - n, 0) * 1000000 div 6"))
  }
}
