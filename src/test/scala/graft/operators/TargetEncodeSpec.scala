package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("looMeanE6: hand LOO + smoothing, singleton NULL, exact prior") {
    // X: y ∈ {10,20,30}; Y: {40}. global mean = 100/4 (exact rational)
    val rows = Seq(("X", 10L), ("X", 20L), ("X", 30L), ("Y", 40L))
    val got = TargetEncode.looMeanE6(rows.toDF("cat", "y").repartition(3),
        "cat", "y", priorWeight = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toMap
    // X,10: loo = 50e6/2 = 25e6; smooth = (50·4 + 2·100)e6/(4·4) = 25e6
    assert(got("X" -> 10L) == ((Some(25000000L), 25000000L)))
    // X,20: loo = 40e6/2 = 20e6; smooth = 360e6/16 = 22.5e6 (truncated)
    assert(got("X" -> 20L) == ((Some(20000000L), 22500000L)))
    // X,30: loo = 30e6/2 = 15e6; smooth = 320e6/16 = 20e6
    assert(got("X" -> 30L) == ((Some(15000000L), 20000000L)))
    // singleton category: LOO undefined (NULL), smoothing falls back to
    // the pure prior: (0·4 + 2·100)e6/(2·4) = 25e6 = the global mean
    assert(got("Y" -> 40L) == ((None, 25000000L)))
  }
}
