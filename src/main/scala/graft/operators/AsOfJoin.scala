package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal / versioned-dimension) join.
  *
  * For each fact row, attaches the latest dim row with `dimTs <= factTs` on
  * the same key, optionally within `toleranceMs`. Semantics of the
  * reference's TemporalJoinFunction (P:common/functions/TemporalJoinFunction
  * .java:32-207 — RocksDB-ordered dim versions probed per fact) and the
  * nearest-*preceding* fallback of the inferred-reference joins
  * (P:common/functions/inferred/BaseInferred.java:605-650).
  *
  * Scale design: tag both inputs, union, and resolve with ONE window pass —
  * a single hash-partition shuffle on the key + one sort, instead of a
  * per-fact probe or an exploding range join. Per-key state during the scan
  * is O(1) (the running "last dim payload"), so skewed keys stream rather
  * than buffer; 1000-executor behavior is one exchange + sorted scan.
  *
  * Timestamps are epoch-millis longs (the reference's data-plane convention,
  * SURVEY §1.3).
  */
object AsOfJoin {

  /** @param dimCols   dim columns to attach (output names get `dimPrefix`)
    * @param factOrder fact tie-break column (unique id) — output determinism
    * @param dimOrder  dim tie-break: among equal-ts dim rows the largest wins
    */
  def leftAsOf(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factTsMs: String,
      dimTsMs: String,
      dimCols: Seq[String],
      dimOrder: String,
      toleranceMs: Long = Long.MaxValue,
      dimPrefix: String = ""): DataFrame = {

    val factOut = fact.columns.toSeq
    val dimPayloadCols = (dimCols :+ dimTsMs).distinct

    // Shared shape: keys, __ts, __side (dim sorts before fact at equal ts so
    // a same-millisecond dim row is visible to the fact), __ord tie-break,
    // __fact / __dim payload structs.
    val dimStruct = struct(dimPayloadCols.map(col): _*)
    val dimStructType = dim.select(dimStruct.as("s")).schema("s").dataType
    val factStruct = struct(factOut.map(col): _*)
    val factStructType = fact.select(factStruct.as("s")).schema("s").dataType

    val factSide = fact.select(
      keys.map(col) ++ Seq(
        col(factTsMs).cast("long").as("__ts"), lit(1).as("__side"),
        col(factTsMs).cast("long").as("__ord"), // fact order irrelevant to matching
        factStruct.as("__fact"), lit(null).cast(dimStructType).as("__dim")): _*)
    val dimSide = dim.select(
      keys.map(col) ++ Seq(
        col(dimTsMs).cast("long").as("__ts"), lit(0).as("__side"),
        col(dimOrder).cast("long").as("__ord"),
        lit(null).cast(factStructType).as("__fact"), dimStruct.as("__dim")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = factSide.unionByName(dimSide)
      .withColumn("__m", last(col("__dim"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val inTolerance =
      col("__m").isNotNull && (col("__ts") - col("__m").getField(dimTsMs) <= toleranceMs)
    val gated = matched.withColumn("__mm", when(inTolerance, col("__m")))

    gated.select(
      factOut.map(c => col(s"__fact.$c").as(c)) ++
        dimPayloadCols.map(c => col(s"__mm.$c").as(dimPrefix + c)): _*)
  }
}
