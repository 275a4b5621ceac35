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

  /** Bucket-over-bucket audience overlap — "how much of today's audience
    * was here yesterday", the churn companion to the cohort triangle:
    * exact Jaccard between consecutive buckets' distinct-user sets,
    * decided in integers from three censuses (per-bucket sizes, the
    * shifted equi-join intersection, never a set product). Buckets with
    * no predecessor drop. Output: (bucket_ms, n_active, n_prev,
    * n_inter, jaccard_ppm). */
  def audienceChurn(events: DataFrame, userCol: String, tsMsCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0)
    val act = events.select(col(userCol).as("u"),
        (col(tsMsCol) - pmod(col(tsMsCol), lit(bucketMs))).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = act.groupBy(col("b")).agg(count(lit(1)).as("n"))
    val inter = act.as("cur").join(act.as("prev"),
        col("cur.u") === col("prev.u") &&
          col("cur.b") === col("prev.b") + bucketMs)
      .groupBy(col("cur.b").as("b")).agg(count(lit(1)).as("n_inter"))
    sizes
      .join(sizes.select((col("b") + bucketMs).as("b"),
        col("n").as("n_prev")), "b")
      .join(inter, Seq("b"), "left")
      .select(col("b").as("bucket_ms"), col("n").as("n_active"),
        col("n_prev"), coalesce(col("n_inter"), lit(0L)).as("n_inter"))
      .withColumn("jaccard_ppm",
        expr("n_inter * 1000000 div (n_active + n_prev - n_inter)"))
  }
}
