package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript/dialog structural QA — the validation pass an SFT/chat
  * training-data pipeline runs before a conversation enters the mix.
  *
  * A transcript is a (session, ts-ordered turns, role-per-turn) frame;
  * the audit emits one row per session with the structural facts a
  * data card needs and a filter keys on:
  *
  *  - turn count and distinct-role count;
  *  - first/last role (chat templates demand user-first and often
  *    user-last for training pairs);
  *  - alternation violations (consecutive same-role turns — the #1
  *    formatting defect in scraped dialog) and the longest same-role
  *    run;
  *  - timing: max and total inter-turn gap in ms (epoch-millis
  *    integers — house determinism rule, no double seconds).
  *
  * Everything is windows PARTITIONED BY session with a total order on
  * (ts_ms, tie) — per-session state only, no global sort, no single
  * reducer; the run-length step is the classic gaps-and-islands
  * running sum over the same partition. At 100 TB sessions hash-
  * shuffle once and each partition's windows stream in memory.
  */
object DialogQa {

  /** One audit row per session. `tie` breaks equal timestamps so the
    * turn order (and therefore every output) is total and
    * replay-stable across engines. */
  def transcriptAudit(df: DataFrame, session: Column, tsMs: Column,
      role: Column, tie: Column): DataFrame = {
    val base = df.select(session.as("session"), tsMs.cast("long").as("ts_ms"),
        role.cast("string").as("role"), tie.cast("long").as("tie"))
      .where(col("session").isNotNull && col("ts_ms").isNotNull &&
        col("role").isNotNull)
    val w = Window.partitionBy(col("session"))
      .orderBy(col("ts_ms"), col("tie"))
    val turns = base
      .withColumn("__prev_role", lag(col("role"), 1).over(w))
      .withColumn("__gap_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev_role").isNull ||
          col("__prev_role") =!= col("role"), 1L).otherwise(0L))
      .withColumn("__run_id", sum(col("__brk")).over(
        Window.partitionBy(col("session"))
          .orderBy(col("ts_ms"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = turns.groupBy(col("session"), col("__run_id"))
      .agg(count(lit(1)).as("__run_len"))
      .groupBy(col("session"))
      .agg(max(col("__run_len")).as("max_role_run"))
    val perSession = turns.groupBy(col("session"))
      .agg(
        count(lit(1)).as("n_turns"),
        count_distinct(col("role")).as("n_roles"),
        min_by(col("role"), struct(col("ts_ms"), col("tie")))
          .as("first_role"),
        max_by(col("role"), struct(col("ts_ms"), col("tie")))
          .as("last_role"),
        sum(when(col("__prev_role") === col("role"), 1L).otherwise(0L))
          .as("alternation_violations"),
        max(col("__gap_ms")).as("max_gap_ms"),
        coalesce(sum(col("__gap_ms")), lit(0L)).as("total_gap_ms"))
    perSession.join(runs, Seq("session"))
  }
}
