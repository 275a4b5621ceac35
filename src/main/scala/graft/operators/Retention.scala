package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: bucket every user into the cohort of their first
  * event, then count distinct active users per (cohort, offset) cell —
  * the day-N retention triangle every product-metrics engine ships.
  *
  * Shape: one aggregation finds each user's first-seen bucket (partial
  * min combines map-side), the join back to events reuses the user-key
  * shuffle, and the final cell count is a distinct-aggregate on bounded
  * keys (cohort × offset cells ≪ events). No window sorts; nothing
  * driver-side. At 100 TB the cohort frame is |users| rows — shuffle-
  * joined on the same key partitioning, never broadcast-sized.
  *
  * Output: (cohort_ms, offset, users) — cohort bucket start, whole-bucket
  * offset ≥ 0, distinct active users. */
object Retention {

  def cohortRetention(events: DataFrame, userCol: String, tsMsCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    val e = events.select(col(userCol).as("u"),
      (col(tsMsCol) - pmod(col(tsMsCol), lit(bucketMs))).as("b"))
    val cohorts = e.groupBy(col("u")).agg(min(col("b")).as("cohort_ms"))
    e.join(cohorts, "u")
      .groupBy(col("cohort_ms"),
        ((col("b") - col("cohort_ms")) / lit(bucketMs)).cast("long").as("offset"))
      .agg(countDistinct(col("u")).as("users"))
  }

  /** Cohort lifetime value — the monetary companion to
    * [[cohortRetention]]: per (first-seen cohort, whole-bucket age), the
    * events and integer revenue contributed, plus the RUNNING total per
    * cohort (the LTV curve finance reads off the triangle).
    *
    * Shape: the same cohort-assignment join on the user key, a
    * census-sized (cohort × age) aggregation, then ONE cumulative window
    * over the census cells — the window never sees event rows. */
  def cohortLtv(events: DataFrame, userCol: String, tsMsCol: String,
      valueCents: org.apache.spark.sql.Column, bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    val e = events.select(col(userCol).as("u"),
      (col(tsMsCol) - pmod(col(tsMsCol), lit(bucketMs))).as("b"),
      valueCents.cast("long").as("cents"))
    val cohorts = e.groupBy(col("u")).agg(min(col("b")).as("cohort_ms"))
    val cells = e.join(cohorts, "u")
      .groupBy(col("cohort_ms"),
        ((col("b") - col("cohort_ms")) / lit(bucketMs)).cast("long").as("age"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    val byAge = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_ms")).orderBy(col("age"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells.withColumn("cum_cents", sum(col("sum_cents")).over(byAge))
  }
}
