package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Int8 min-max embedding quantization — the storage lever that shrinks
  * a float32 embedding column 4× before ANN indexing (per-dimension
  * affine codes, the standard scalar-quantization baseline PQ is
  * compared against). Components are e9-quantized first so codes and
  * reconstruction error are decided in pure integers:
  *
  *   code_i = round(255·(x_i − min_i) / span_i)   (0 when span_i = 0)
  *   err_i  = |255·(x_i − min_i) − code_i·span_i|  (|residual|·255·span-scaled)
  *
  * Shape: pass 1 computes the d-row per-dimension min/max census
  * (posexplode → d-key aggregation — partial aggregation upstream means
  * the shuffle carries d rows per task, not n·d), folds it into ONE
  * array-typed row, and broadcasts it; pass 2 encodes every vector with
  * codegen'd array lambdas against the broadcast arrays — no
  * per-component shuffle, no driver collect. At 100 TB pass 1 is a
  * column scan, pass 2 is map-only. */
object Quantize {

  /** Per-vector int8 codes summary + exact reconstruction error.
    * Output: (idCol, sum_code, wsum_code, err_255e9) where wsum_code =
    * Σ code_i·(i+1) pins positions and err_255e9 = Σ err_i. */
  def int8MinMaxSummary(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val e9 = emb.select(col(idCol),
      expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT))")
        .as("v"))
    val stats = e9
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx"))))
        .as("s"))
      .select(expr("transform(s, p -> p.mn)").as("mins"),
        expr("transform(s, p -> CAST(p.mx - p.mn AS BIGINT))").as("spans"))
    e9.crossJoin(broadcast(stats))
      .withColumn("codes", expr(
        """transform(v, (x, i) -> CASE WHEN element_at(spans, i + 1) > 0
          |  THEN ((x - element_at(mins, i + 1)) * 510 + element_at(spans, i + 1))
          |       div (2 * element_at(spans, i + 1))
          |  ELSE 0L END)""".stripMargin))
      .withColumn("errs", expr(
        """transform(v, (x, i) ->
          |  abs((x - element_at(mins, i + 1)) * 255
          |      - element_at(codes, i + 1) * element_at(spans, i + 1)))"""
          .stripMargin))
      .select(col(idCol),
        expr("aggregate(codes, 0L, (a, b) -> a + b)").as("sum_code"),
        expr("aggregate(transform(codes, (c, i) -> c * (i + 1)), 0L, (a, b) -> a + b)")
          .as("wsum_code"),
        expr("aggregate(errs, 0L, (a, b) -> a + b)").as("err_255e9"))
  }
}
