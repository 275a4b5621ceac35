package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class UpsertTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(deleteCol: Option[String] = Some("del")) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    (dir, new UpsertTable(s"$dir/t", Seq("k"), "ver", Seq("dt"), deleteCol))
  }

  private def row(k: Long, dt: String, ver: Long, v: String,
      del: Boolean = false) = (k, dt, ver, v, del)

  private def frame(rows: (Long, String, Long, String, Boolean)*) =
    rows.toDF("k", "dt", "ver", "v", "del")

  test("snapshot resolves latest version per key; later commit wins ties") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b")))
    t.upsert(frame(row(1, "d1", 2, "a2"), row(2, "d1", 1, "b2"))) // k2: same ver, later commit
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b2")))
  }

  test("delete flag removes the key; a later upsert resurrects it") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b")))
    t.upsert(frame(row(1, "d1", 2, "x", del = true)))
    assert(t.snapshot(spark).select("k").as[Long].collect().toSet == Set(2L))
    t.upsert(frame(row(1, "d1", 3, "back")))
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "back"), (2L, "b")))
  }

  test("resolution is per (partition, key) — non-global index semantics") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    t.upsert(frame(row(1, "d2", 2, "moved"))) // same key, new partition → new row
    val got = t.snapshot(spark).select("dt", "v").as[(String, String)].collect().toSet
    assert(got == Set(("d1", "a"), ("d2", "moved")))
  }

  test("compact folds deltas into base; snapshot unchanged; deltas cleared") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d2", 1, "b"), row(3, "d1", 1, "c")))
    t.upsert(frame(row(1, "d1", 2, "a2"), row(3, "d1", 2, "gone", del = true)))
    val before = t.snapshot(spark).select("k", "dt", "ver", "v", "del")
      .as[(Long, String, Long, String, Boolean)].collect().toSet
    t.compact(spark)
    assert(t.commits(spark).isEmpty)
    val afterSnap = t.snapshot(spark).select("k", "dt", "ver", "v", "del")
      .as[(Long, String, Long, String, Boolean)].collect().toSet
    val afterRo = t.readOptimized(spark).select("k", "dt", "ver", "v", "del")
      .as[(Long, String, Long, String, Boolean)].collect().toSet
    assert(afterSnap == before)
    assert(afterRo == before) // no pending deltas → RO == snapshot
    assert(!afterRo.exists(_._1 == 3L)) // deleted key absent from base
  }

  test("compact rewrites only partitions the deltas touched") {
    val (dir, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d2", 1, "b")))
    t.compact(spark)
    val untouched = new java.io.File(s"$dir/t/base/dt=d2")
    val filesBefore = untouched.listFiles().map(_.getName).toSet
    t.upsert(frame(row(1, "d1", 2, "a2"))) // touches only d1
    t.compact(spark)
    val filesAfter = untouched.listFiles().map(_.getName).toSet
    assert(filesBefore == filesAfter) // d2's base files untouched
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b")))
  }

  test("snapshot merges base with post-compaction deltas") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b")))
    t.compact(spark)
    t.upsert(frame(row(2, "d1", 2, "b2"), row(3, "d1", 1, "c")))
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // RO view still shows the pre-delta state
    val ro = t.readOptimized(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(ro == Set((1L, "a"), (2L, "b")))
  }

  test("partition column types survive read-back via the recorded schema") {
    val (_, t) = freshTable()
    // dt values that directory-inference would coerce (numeric-looking)
    t.upsert(frame(row(1, "20240101", 1, "a")))
    val sch = t.snapshot(spark).schema
    assert(sch("dt").dataType == org.apache.spark.sql.types.StringType)
  }

  test("streamUpsert commits one delta per micro-batch and compacts on schedule") {
    val (dir, t) = freshTable(deleteCol = None)
    val mem = MemoryStream[(Long, String, Long, String, Boolean)]
    val df = mem.toDS().toDF("k", "dt", "ver", "v", "del")
    val q = t.streamUpsert(df, s"$dir/cp", compactEveryCommits = 2).start()
    mem.addData(row(1, "d1", 1, "a"))
    q.processAllAvailable()
    assert(t.commits(spark) == Seq(1L))
    mem.addData(row(1, "d1", 2, "a2"), row(2, "d1", 1, "b"))
    q.processAllAvailable()
    q.stop()
    assert(t.commits(spark).isEmpty) // second commit triggered compaction
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (2L, "b")))
  }
}
