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
}
