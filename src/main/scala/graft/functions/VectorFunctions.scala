package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (`Array[Float]` columns).
  *
  * Pure `functions._` compositions (zip_with/aggregate are codegen'd) — no
  * UDF boxing on the 100 TB path. Double accumulation for precision.
  */
object VectorFunctions {

  /** Dot product in double precision (sequential left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Quantized (integer) dot product: Σ round(x_i·y_i·1e9) as BIGINT.
    *
    * Integer partial sums are associative — the result is bit-identical
    * regardless of aggregation/partition order, which double sums are not.
    * Used by the verification queries so Spark and the DuckDB oracle agree
    * exactly; ~1e-9 quantization error is far below any ranking gap.
    */
  def dotE9(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * y.cast("double") * lit(1e9)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def normSqE9(a: Column): Column = dotE9(a, a)

  /** Cosine score from quantized components — deterministic cross-engine. */
  def cosineFromE9(dotE9: Column, normSqAE9: Column, normSqBE9: Column): Column =
    dotE9.cast("double") / sqrt(normSqAE9.cast("double") * normSqBE9.cast("double"))
}
