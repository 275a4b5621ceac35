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

  /** Direction-parameterized as-of join — pandas `merge_asof` parity:
    * `backward` (latest dim ≤ factTs), `forward` (earliest dim ≥
    * factTs), `nearest` (smaller |Δ|, ties to backward), all tolerance-
    * gated and INCLUSIVE of equal timestamps in every direction.
    *
    * Shape: dim rows first collapse to one per (key, ts) — largest
    * `dimOrder` wins, the [[leftAsOf]] tie rule — which is what lets
    * both direction probes ride RANGE frames over ONE (key, ts) sort:
    * prev = last non-null dim over (−∞, 0], next = first non-null dim
    * over [0, +∞); equal-ts peers are inside both frames regardless of
    * intra-ts order, so inclusivity needs no side column. Still a
    * single hash exchange + one sort at any scale. */
  def directionalAsOf(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factTsMs: String,
      dimTsMs: String,
      dimCols: Seq[String],
      dimOrder: String,
      direction: String,
      toleranceMs: Long = Long.MaxValue,
      dimPrefix: String = ""): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction=$direction")
    val factOut = fact.columns.toSeq
    val dimPayloadCols = (dimCols :+ dimTsMs).distinct

    // one dim row per (key, ts): max(struct(ord, payload)) — largest wins
    val dimOne = dim
      .groupBy(keys.map(col) :+ col(dimTsMs).cast("long").as("__ts"): _*)
      .agg(max(struct(col(dimOrder).cast("long").as("__o"),
        struct(dimPayloadCols.map(col): _*).as("__p"))).as("__w"))
      .select(keys.map(col) ++ Seq(col("__ts"),
        col("__w.__p").as("__dim")): _*)
    val dimStructType = dimOne.schema("__dim").dataType
    val factStruct = struct(factOut.map(col): _*)
    val factStructType = fact.select(factStruct.as("s")).schema("s").dataType

    val factSide = fact.select(
      keys.map(col) ++ Seq(col(factTsMs).cast("long").as("__ts"),
        lit(1).as("__side"), factStruct.as("__fact"),
        lit(null).cast(dimStructType).as("__dim")): _*)
    val dimSide = dimOne.select(
      keys.map(col) ++ Seq(col("__ts"), lit(0).as("__side"),
        lit(null).cast(factStructType).as("__fact"), col("__dim")): _*)

    val base = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts"))
    val backW = base.rangeBetween(Window.unboundedPreceding, 0)
    val fwdW = base.rangeBetween(0, Window.unboundedFollowing)

    val probed = factSide.unionByName(dimSide)
      .withColumn("__prev", last(col("__dim"), ignoreNulls = true).over(backW))
      .withColumn("__next", first(col("__dim"), ignoreNulls = true).over(fwdW))
      .where(col("__side") === 1)

    val prevTs = col("__prev").getField(dimTsMs)
    val nextTs = col("__next").getField(dimTsMs)
    val prevOk = col("__prev").isNotNull && col("__ts") - prevTs <= toleranceMs
    val nextOk = col("__next").isNotNull && nextTs - col("__ts") <= toleranceMs
    val chosen = direction match {
      case "backward" => when(prevOk, col("__prev"))
      case "forward" => when(nextOk, col("__next"))
      case "nearest" =>
        when(prevOk && nextOk,
          when(nextTs - col("__ts") < col("__ts") - prevTs, col("__next"))
            .otherwise(col("__prev")))
          .when(prevOk, col("__prev"))
          .when(nextOk, col("__next"))
    }
    probed.withColumn("__mm", chosen).select(
      factOut.map(c => col(s"__fact.$c").as(c)) ++
        dimPayloadCols.map(c => col(s"__mm.$c").as(dimPrefix + c)): _*)
  }
}
