package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StylometrySpec extends SparkSpec {
  import spark.implicits._

  test("burrowsDeltaAttribution: style-separated sources attribute " +
      "correctly; zero-variance words carry no signal") {
    // A-docs lean on "x", B-docs on "y"; "z" is uniform (σ = 0 →
    // excluded, so n_words_used = 2)
    val docs = Seq(
      (1L, "A", "x x z"), (2L, "A", "x z z"),
      (3L, "B", "y y z"), (4L, "B", "y z z"))
      .toDF("doc_id", "src", "text")
    val got = Stylometry.burrowsDeltaAttribution(docs, "doc_id",
      "text", "src", topWords = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == 4)
    got.values.foreach { r =>
      assert(r.getBoolean(4), s"doc ${r.getLong(0)} misattributed")
      assert(r.getLong(5) == 2L)
    }
    // doc 1 vs A: Σ|Δz| = |1178511 − 707106| + 0 → delta = 235702
    assert(got(1L).getLong(3) == 235702L)
  }
}
