package graft.operators

import graft.SparkSpec

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("verdict precedence, refs, and greedy-by-id batch semantics") {
    val history = Seq(
      (2L, "alpha beta gamma delta"),
      (4L, "unique history content here"),
      (5L, "alpha beta gamma delta")) // second exact copy: ref must be MIN (2)
      .toDF("doc_id", "text")
    val batch = Seq(
      (3L, "alpha beta gamma delta"),            // exact history dup
      (6L, "alpha beta gamma delta epsilon"),    // near history dup (J=2/3)
      (9L, "alpha beta gamma delta"),            // exact history wins over batch
      (12L, "totally new words completely different"),
      (15L, "totally new words completely different"), // exact batch dup of 12
      (18L, "totally new words completely distinct"))  // near batch dup (J=1/2)
      .toDF("doc_id", "text")
    val got = IncrementalIngest.ingest(history, batch, "doc_id", "text",
        n = 3, numHashes = 32, minJacNum = 1L, minJacDen = 2L)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set(
      (3L, "dup_exact_history", Some(2L)),
      (6L, "dup_near_history", Some(2L)),
      (9L, "dup_exact_history", Some(2L)),
      (12L, "new", None),
      (15L, "dup_exact_batch", Some(12L)),
      (18L, "dup_near_batch", Some(12L))))
  }

  test("short documents (no shingles) still get exact verdicts") {
    val history = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val batch = Seq((10L, "tiny doc"), (20L, "other tiny")).toDF("doc_id", "text")
    val got = IncrementalIngest.ingest(history, batch, "doc_id", "text",
        3, 32, 1L, 2L)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == Set(
      (10L, "dup_exact_history", Some(1L)),
      (20L, "new", None)))
  }
}
