package graft.operators

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8MinMaxSummary: codes and residuals replay by hand") {
    // dim0 spans [0.0, 1.0] → e9 span 1e9; dim1 constant → span 0
    val rows = Seq((1L, Seq(0.0f, 7.0f)), (2L, Seq(1.0f, 7.0f)),
      (3L, Seq(0.5f, 7.0f))).toDF("vec_id", "embedding")
    val got = Quantize.int8MinMaxSummary(rows, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // codes dim0: x=0 → 0; x=1e9 → 255; x=5e8 → round(127.5) = 128
    // (round-half-up), residual |5e8·255 − 128·1e9| = 5e8
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(2L) == ((255L, 255L, 0L)))
    assert(got(3L) == ((128L, 128L, 500000000L)))
  }

  test("reconstruction error bounded by half a step") {
    val vecs = (0L until 20L).map(i =>
      (i, Seq((i * 37 % 101).toFloat / 101f, (i * 53 % 97).toFloat / 97f)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Quantize.int8MinMaxSummary(df, "vec_id", "embedding").collect()
    assert(rows.length == 20)
    // per-dim span ≤ 1e9 ⇒ err_i ≤ span/2 ⇒ total ≤ d · 5e8
    assert(rows.forall(_.getLong(3) <= 2L * 500000000L))
  }
}
