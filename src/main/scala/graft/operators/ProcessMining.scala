package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Directly-follows conformance checking (van der Aalst, Process Mining
  * 2016, §8 — the DFG token-replay reduced to its first moment): the
  * observed directly-follows census per case stream vs a DECLARED
  * process model (the allowed (from, to) edge set), per observed edge
  * its traffic and legality, and per source activity the conforming
  * share — the "is production behaving like the designed process"
  * table, with the worst off-model edges ranked inside it.
  *
  * Output per observed (from_act, to_act): n, allowed, from_total,
  * share_of_from_e6 (n·1e6 div from_total), conforming_of_from_e6 —
  * exact truncating integers off one transition census.
  *
  * Shape: the lead() runs in REAL per-case partitions (the q82 shape);
  * everything after is (activity × activity) census arithmetic with the
  * model broadcast as a literal frame. */
object ProcessMining {

  def dfgConformanceE6(df: DataFrame, caseCol: Column, ts: Column,
      tieBreak: Column, activity: Column,
      model: Seq[(String, String)]): DataFrame = {
    require(model.nonEmpty, "dfgConformanceE6: empty model")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("c")).orderBy(col("t"), col("tb"))
    val census = df.select(caseCol.as("c"), ts.as("t"),
        tieBreak.as("tb"), activity.as("a"))
      .withColumn("next", lead(col("a"), 1).over(w))
      .where(col("next").isNotNull)
      .groupBy(col("a").as("from_act"), col("next").as("to_act"))
      .agg(count(lit(1)).as("n"))
    val m = broadcast(model.toDF("mf", "mt").distinct()
      .withColumn("__ok", lit(1L)))
    val flagged = census.join(m,
        col("from_act") === col("mf") && col("to_act") === col("mt"),
        "left")
      .select(col("from_act"), col("to_act"), col("n"),
        col("__ok").isNotNull.as("allowed"))
    val wf = Window.partitionBy(col("from_act"))
    flagged
      .withColumn("from_total", sum(col("n")).over(wf))
      .withColumn("__conf",
        sum(when(col("allowed"), col("n")).otherwise(0L)).over(wf))
      .withColumn("share_of_from_e6",
        expr("n * 1000000 div from_total"))
      .withColumn("conforming_of_from_e6",
        expr("__conf * 1000000 div from_total"))
      .drop("__conf")
  }
}
