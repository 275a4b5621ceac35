package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
