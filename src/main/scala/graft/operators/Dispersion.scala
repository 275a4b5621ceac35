package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-dispersion audit over bucketed event streams: the Fano factor
  * (variance-to-mean ratio; Fano 1947) and a negative-binomial
  * method-of-moments fit — the standard "is this stream Poisson, or
  * bursty" screen a pipeline runs before alerting thresholds or
  * rate-based sampling are tuned (Poisson ⇒ Fano = 1; overdispersion
  * ⇒ Fano > 1 and the NB (r, p) describes the burst structure).
  *
  * Input: one row per (group, bucket) with the bucket's event count —
  * the caller gap-fills missing buckets with 0 (zeros carry signal;
  * the q162 gap-fill operator is the natural producer). Per group with
  * n buckets, S = Σc, Q = Σc²:
  *
  *   mean_e6 = S·1e6 div n
  *   fano_e6 = (n·Q − S²)·1e6 div (n·S)            (var/mean, exact)
  *   nb_r_e6 = S²·1e6 div (n·Q − S² − n·S)          when var > mean
  *   nb_p_e6 = n·S·1e6 div (n·Q − S²)               (p = mean/var)
  *
  * — the textbook MoM identities cleared of the n² denominators so
  * every quantity is a ratio of exact DECIMAL(38,0) integers with ONE
  * truncating division each. NULL fano/p when S = 0 or var = 0; NULL
  * (r, p) when var ≤ mean (under-dispersed: NB undefined — any
  * imputation would lie).
  *
  * Scale shape: ONE hash aggregate from bucket grain to group grain;
  * everything after is scalar arithmetic on the group census. Bucket
  * counts are the caller's aggregate of raw events, so the raw pass is
  * also a single map-side-combined aggregate.
  */
object Dispersion {

  def fanoNbE6(df: DataFrame, groupCols: Seq[String],
      count: Column): DataFrame = {
    val base = df.select(
      groupCols.map(col) :+ count.cast("long").as("c"): _*)
    base.groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        sum(col("c")).as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
      .withColumn("__vnum", expr(
        "n * q - CAST(s AS DECIMAL(38,0)) * s"))
      .select(
        groupCols.map(col) :+ col("n") :+ col("s") :+
          expr("CAST(s AS DECIMAL(38,0)) * 1000000 div n")
            .as("mean_e6") :+
          when(col("s") > 0L, expr(
            "CAST(__vnum * 1000000 div (n * CAST(s AS DECIMAL(38,0))) AS BIGINT)"))
            .as("fano_e6") :+
          when(expr("__vnum > n * CAST(s AS DECIMAL(38,0))"), expr(
            """CAST(CAST(s AS DECIMAL(38,0)) * s * 1000000
              |div (__vnum - n * CAST(s AS DECIMAL(38,0))) AS BIGINT)"""
              .stripMargin)).as("nb_r_e6") :+
          when(col("__vnum") > 0L, expr(
            """CAST(n * CAST(s AS DECIMAL(38,0)) * 1000000
              |div __vnum AS BIGINT)""".stripMargin)).as("nb_p_e6"): _*)
  }
}
