package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Off-policy (counterfactual) policy evaluation from logged feedback —
  * the "what would this targeting policy have earned" question answered
  * from logs alone, no live experiment:
  *
  *  - REPLAY (Li, Chu, Langford & Wang, WSDM 2011): evaluate only the
  *    logged rounds where the logged action happens to equal the
  *    candidate policy's action; their mean reward is unbiased when
  *    logging was uniform.
  *  - IPS (Horvitz–Thompson / inverse propensity scoring): weight each
  *    matched reward by 1/p(logged action); under uniform-K logging the
  *    weight is the constant K, so the estimate is the exact integer
  *    ratio K·Σ matched rewards / n_eval.
  *
  * The candidate policy is itself learned from the data: per context
  * segment, the arm with the best TRAIN-period truncated mean reward
  * (mean_e6 = sum·10⁶ div n, ties to the lexicographically first arm) —
  * a strict train/eval time split so the evaluation never scores the
  * period that chose the arm.
  *
  * Scale shape: train stats aggregate to (segments × arms) rows — a
  * bounded frame whose argmax window is trivially small — and the
  * chosen-arm map broadcasts back onto one eval-side scan. Two scans
  * total, one small shuffle each; nothing driver-side but the policy
  * table itself.
  */
object OffPolicy {

  /** Output: one row per segment —
    * (segment, chosen_arm, n_eval, n_matched, sum_matched,
    *  ips_num = K·sum_matched, ips_den = n_eval). */
  def replayIps(df: DataFrame, segment: Column, arm: Column,
      reward: Column, isTrain: Column, nArms: Int): DataFrame = {
    val base = df.select(segment.as("segment"), arm.as("__arm"),
      reward.cast("long").as("__r"), isTrain.as("__train"))
    val policy = base.where(col("__train"))
      .groupBy(col("segment"), col("__arm"))
      .agg(sum(col("__r")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__mean_e6", expr("__s * 1000000 div __n"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("segment"))
          .orderBy(col("__mean_e6").desc, col("__arm").asc)))
      .where(col("__rk") === 1)
      .select(col("segment"), col("__arm").as("chosen_arm"))
    base.where(!col("__train"))
      .join(broadcast(policy), Seq("segment"))
      .groupBy(col("segment"), col("chosen_arm"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("__arm") === col("chosen_arm"), 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("__arm") === col("chosen_arm"), col("__r"))
          .otherwise(0L)).as("sum_matched"))
      .withColumn("ips_num", col("sum_matched") * nArms)
      .withColumn("ips_den", col("n_eval"))
  }

  /** SNIPS + doubly-robust evaluation under LOGGED propensities — the
    * production pair when logging was NOT uniform (Swaminathan & Joachims
    * 2015 for the self-normalized estimator; Dudík, Langford & Li 2011
    * for DR). The candidate policy is the same train-period truncated-
    * mean argmax as [[replayIps]]; for a deterministic policy only rows
    * whose logged arm matches carry importance weight, so
    *
    *   SNIPS = Σ_matched r·1e12 div p_ppm  /  Σ_matched 1e12 div p_ppm
    *   DR_i  = q̂(x, π(x)) + 1{a=π(x)}·(r·1e6 − q̂(x,a))·1e6 div p_ppm
    *
    * with q̂ the train-period (segment, arm) truncated mean (e6 cents;
    * arms unseen in training back off to 0 — documented, not hidden:
    * the n_train_miss column counts those rows). Every per-row division
    * is a truncating integer div on e-scaled integers, every sum rides
    * DECIMAL(38,0) — the oracle replays each row.
    *
    * Scale shape: one train aggregate to (segments × arms), broadcast
    * twice onto one eval-side scan (policy arm + logged-arm q̂); one
    * final per-segment aggregate. No windows over data, no collects.
    *
    * Output per segment: (segment, chosen_arm, n_eval, n_matched,
    * n_train_miss, snips_num, snips_den, snips_e6, dr_sum_e6,
    * dr_mean_e6). */
  def snipsDr(df: DataFrame, segment: Column, arm: Column,
      reward: Column, propensityPpm: Column, isTrain: Column): DataFrame = {
    val base = df.select(segment.as("segment"), arm.as("__arm"),
      reward.cast("long").as("__r"),
      propensityPpm.cast("long").as("__p"), isTrain.as("__train"))
      .where(col("__p") > 0L)
    val qhat = base.where(col("__train"))
      .groupBy(col("segment"), col("__arm"))
      .agg(sum(col("__r")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__q_e6", expr("__s * 1000000 div __n"))
      .select(col("segment"), col("__arm"), col("__q_e6"))
    val policy = qhat
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("segment"))
          .orderBy(col("__q_e6").desc, col("__arm").asc)))
      .where(col("__rk") === 1)
      .select(col("segment"), col("__arm").as("chosen_arm"),
        col("__q_e6").as("__q_pi"))
    base.where(!col("__train"))
      .join(broadcast(policy), Seq("segment"))
      .join(broadcast(qhat.select(col("segment"), col("__arm"),
        col("__q_e6").as("__q_a"))), Seq("segment", "__arm"), "left")
      .select(col("segment"), col("chosen_arm"), col("__r"), col("__p"),
        (col("__arm") === col("chosen_arm")).as("__m"),
        col("__q_pi"), coalesce(col("__q_a"), lit(0L)).as("__qa"),
        col("__q_a").isNull.as("__miss"))
      .select(col("segment"), col("chosen_arm"), col("__m"), col("__miss"),
        expr("CASE WHEN __m THEN __r * 1000000000000 div __p ELSE 0 END")
          .as("__sn"),
        expr("CASE WHEN __m THEN 1000000000000 div __p ELSE 0 END")
          .as("__sd"),
        expr("""__q_pi + CASE WHEN __m
               | THEN (__r * 1000000 - __qa) * 1000000 div __p
               | ELSE 0 END""".stripMargin).as("__dr"))
      .groupBy(col("segment"), col("chosen_arm"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("__miss"), 1L).otherwise(0L)).as("n_train_miss"),
        sum(col("__sn").cast("decimal(38,0)")).as("snips_num"),
        sum(col("__sd").cast("decimal(38,0)")).as("snips_den"),
        sum(col("__dr").cast("decimal(38,0)")).as("dr_sum_e6"))
      .select(col("segment"), col("chosen_arm"), col("n_eval"),
        col("n_matched"), col("n_train_miss"),
        col("snips_num"), col("snips_den"),
        expr("""CASE WHEN snips_den = 0 THEN NULL
               | ELSE CAST(snips_num * 1000000 div snips_den AS BIGINT)
               | END""".stripMargin).as("snips_e6"),
        col("dr_sum_e6"),
        expr("CAST(dr_sum_e6 div n_eval AS BIGINT)").as("dr_mean_e6"))
  }
}
