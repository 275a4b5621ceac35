package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-driven derived-table maintenance: a per-partition aggregate table
  * follows a mutable source through [[DerivedAggTable.refresh]] cycles —
  * inserts, updates, deletions, vanished groups, untouched groups left
  * unrewritten, idempotent replay after a lost checkpoint, and the loud
  * compaction-horizon failure when the consumer lags a compaction. */
class DerivedAggSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, String, Long, Long, Boolean)*) =
    rows.toDF("k", "dt", "ver", "amt", "del")

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("dt").agg(
      count(lit(1)).as("n"), sum("amt").as("amt_sum"))

  private def fixture() = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derived").toString
    val src = new UpsertTable(s"$dir/src", Seq("k"), "ver", Seq("dt"), Some("del"))
    val drv = new UpsertTable(s"$dir/drv", Seq("dt"), "__ver", Nil, Some("__dead"))
    val marker = s"$dir/_cdc_ckpt"
    (src, drv, new DerivedAggTable(src, drv, Seq("dt"), agg, marker), marker)
  }

  private def derivedState(drv: UpsertTable): Set[(String, Long, Long)] =
    drv.snapshot(spark).select("dt", "n", "amt_sum")
      .as[(String, Long, Long)].collect().toSet

  private def oracle(d: DerivedAggTable): Set[(String, Long, Long)] =
    d.fullRecompute(spark).as[(String, Long, Long)].collect().toSet

  test("refresh chain tracks inserts, updates, deletes and vanished groups") {
    val (src, drv, d, _) = fixture()
    // round 1: three partitions
    src.upsert(frame((1, "A", 1, 10, false), (2, "A", 1, 20, false),
      (3, "B", 1, 30, false), (5, "C", 1, 50, false)))
    val cp1 = d.refresh(spark)
    assert(derivedState(drv) == oracle(d))
    assert(derivedState(drv) == Set(("A", 2L, 30L), ("B", 1L, 30L), ("C", 1L, 50L)))
    // round 2: update k1, insert k4 into B, delete k3 (B survives via k4);
    // C untouched — its derived row must NOT be rewritten
    src.upsert(frame((1, "A", 2, 11, false), (4, "B", 1, 40, false),
      (3, "B", 2, 0, true)))
    val cVerBefore = drv.snapshot(spark).where(col("dt") === "C")
      .select("__ver").as[Long].head()
    val cp2 = d.refresh(spark)
    assert(cp2 > cp1)
    assert(derivedState(drv) == oracle(d))
    assert(derivedState(drv) == Set(("A", 2L, 31L), ("B", 1L, 40L), ("C", 1L, 50L)))
    val cVerAfter = drv.snapshot(spark).where(col("dt") === "C")
      .select("__ver").as[Long].head()
    assert(cVerAfter == cVerBefore, "untouched group was rewritten")
    // round 3: B loses its last key → the derived B row tombstones away
    src.upsert(frame((4, "B", 2, 0, true)))
    d.refresh(spark)
    assert(derivedState(drv) == oracle(d))
    assert(!derivedState(drv).exists(_._1 == "B"))
    // no new commits → no-op, checkpoint unchanged
    val cp3 = d.checkpoint(spark)
    assert(d.refresh(spark) == cp3)
  }

  test("a replayed window (lost checkpoint) converges to the same state") {
    val (src, drv, d, marker) = fixture()
    src.upsert(frame((1, "A", 1, 10, false), (2, "B", 1, 20, false)))
    val cp1 = d.refresh(spark)
    src.upsert(frame((1, "A", 2, 15, false)))
    d.refresh(spark)
    assert(derivedState(drv) == Set(("A", 1L, 15L), ("B", 1L, 20L)))
    // simulate a crash between the derived upsert and the checkpoint
    // write: rewind the marker so the same window replays, plus new data
    java.nio.file.Files.write(java.nio.file.Paths.get(marker),
      cp1.toString.getBytes("UTF-8"))
    src.upsert(frame((2, "B", 2, 25, false)))
    d.refresh(spark)
    assert(derivedState(drv) == oracle(d))
    assert(derivedState(drv) == Set(("A", 1L, 15L), ("B", 1L, 25L)))
  }

  test("consumer lagging past a compaction fails loudly at the horizon") {
    val (src, drv, d, _) = fixture()
    src.upsert(frame((1, "A", 1, 10, false)))
    d.refresh(spark)
    src.upsert(frame((1, "A", 2, 11, false)))
    src.upsert(frame((1, "A", 3, 12, false)))
    src.compact(spark) // folds commits 2..3 past the checkpoint (=1)
    val e = intercept[IllegalArgumentException] { d.refresh(spark) }
    assert(e.getMessage.contains("compaction horizon"))
  }
}
