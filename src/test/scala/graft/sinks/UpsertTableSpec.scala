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

  test("fully-tombstoned partition stays deleted after compaction") {
    // the resurrection bug: if compaction drops delete winners from its
    // output, a partition whose EVERY row was tombstoned has nothing to
    // dynamically overwrite, the stale base files survive, and the
    // deltas holding the tombstones are then deleted
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d2", 1, "b")))
    t.compact(spark)
    t.upsert(frame(row(1, "d1", 2, "x", del = true))) // d1 now fully deleted
    t.compact(spark)
    assert(t.snapshot(spark).select("k").as[Long].collect().toSet == Set(2L))
    assert(t.readOptimized(spark).select("k").as[Long].collect().toSet == Set(2L))
    // and the tombstone still loses to a later resurrect
    t.upsert(frame(row(1, "d1", 3, "back")))
    val got = t.snapshot(spark).select("k", "v").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "back"), (2L, "b")))
  }

  test("commit seqs stay monotonic across compaction — later write wins precombine ties") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 5, "old")))   // seq 1, ver 5
    t.compact(spark)                          // base row keeps __commit=1
    val s2 = t.upsert(frame(row(1, "d1", 5, "new"))) // SAME ver — must win by commit
    assert(s2 == 2L) // not restarted at 1
    val got = t.snapshot(spark).select("v").as[String].collect().toSeq
    assert(got == Seq("new"))
  }

  test("stale seq counter survives compaction deleting the delta dirs") {
    // crash window: commit c2 renamed, _seq write lost (still 1), then a
    // compaction folds c1+c2 and deletes the dirs the fallback scanned —
    // the next upsert must NOT reissue seq 2 (base rows carry __commit=2;
    // a collision breaks later-commit-wins ties)
    val (dir, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    t.upsert(frame(row(1, "d1", 5, "old"))) // seq 2
    new java.io.File(s"$dir/t/._seq.crc").delete() // raw write below bypasses hadoop checksums
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t/_seq"), "1".getBytes("UTF-8"))
    t.compact(spark)
    val s3 = t.upsert(frame(row(1, "d1", 5, "new"))) // same ver: wins by commit
    assert(s3 == 3L)
    assert(t.snapshot(spark).select("v").as[String].collect().toSeq == Seq("new"))
  }

  test("empty or garbage marker files read as absent, not as a crash") {
    val (dir, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    new java.io.File(s"$dir/t/._seq.crc").delete() // raw write below bypasses hadoop checksums
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t/_seq"), Array.empty[Byte])
    assert(t.lastCommitSeq(spark) == 1L) // falls back to the visible dir
    assert(t.upsert(frame(row(1, "d1", 2, "b"))) == 2L)
  }

  test("schema drift fails fast on upsert") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    val retyped = Seq((2L, "d1", 2L, 7)).toDF("k", "dt", "ver", "v")
      .withColumn("del", lit(false)) // v: string -> int
    val e = intercept[IllegalArgumentException] { t.upsert(retyped) }
    assert(e.getMessage.contains("schema drift"))
    val extra = frame(row(2, "d1", 2, "b")).withColumn("surprise", lit(1))
    intercept[IllegalArgumentException] { t.upsert(extra) }
  }

  test("in-flight temp commit dirs are invisible to readers") {
    val (dir, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    // simulate a concurrent writer mid-commit: a temp dir with garbage
    new java.io.File(s"$dir/t/delta/.tmp_c000000002/dt=d1").mkdirs()
    assert(t.commits(spark) == Seq(1L))
    assert(t.snapshot(spark).count() == 1L)
  }

  test("each commit writes one file per touched partition") {
    val (dir, t) = freshTable()
    val wide = frame((1L to 40L).map(k => row(k, s"d${k % 2}", 1, s"v$k")): _*)
      .repartition(8) // many input partitions; must NOT become 8 files/dir
    t.upsert(wide)
    for (d <- Seq("d0", "d1")) {
      val files = new java.io.File(s"$dir/t/delta/c000000001/dt=$d")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"dt=$d has ${files.length} files")
    }
  }

  test("snapshotAt time-travels to a prior commit; horizon enforced") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "v1")))
    t.upsert(frame(row(1, "d1", 2, "v2"), row(2, "d1", 1, "b")))
    t.upsert(frame(row(2, "d1", 2, "gone", del = true)))
    assert(t.snapshotAt(spark, 1).select("k", "v").as[(Long, String)]
      .collect().toSet == Set((1L, "v1")))
    assert(t.snapshotAt(spark, 2).select("k", "v").as[(Long, String)]
      .collect().toSet == Set((1L, "v2"), (2L, "b")))
    assert(t.snapshot(spark).select("k").as[Long].collect().toSet == Set(1L))
    t.compact(spark) // folds up to seq 3 — history before that is gone
    intercept[IllegalArgumentException] { t.snapshotAt(spark, 2) }
    assert(t.snapshotAt(spark, 3).select("k").as[Long].collect().toSet == Set(1L))
  }

  test("incrementalRead returns changed keys at CURRENT state, tombstones opt-in") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b"), row(3, "d1", 1, "c")))
    t.upsert(frame(row(2, "d1", 2, "b2"), row(3, "d1", 2, "x", del = true)))
    // since commit 1: keys 2 (upserted) and 3 (deleted) changed; key 1 did not
    val got = t.incrementalRead(spark, 1L).select("k", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "b2")))
    val withDel = t.incrementalRead(spark, 1L, includeDeletes = true)
      .select("k", "del").as[(Long, Boolean)].collect().toSet
    assert(withDel == Set((2L, false), (3L, true)))
    // empty window → empty frame, schema intact
    assert(t.incrementalRead(spark, 2L).count() == 0L)
  }

  test("changedDistinct: raw touched set without resolution; horizon kept") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d2", 1, "b")))
    t.upsert(frame(row(2, "d2", 2, "b2"), row(3, "d3", 2, "c", del = true)))
    // since commit 1: only commit-2 rows count (deletes included — they
    // are churn), no per-key resolution happens
    val keys = t.changedDistinct(spark, 1L, Seq("k"))
      .as[Long].collect().toSet
    assert(keys == Set(2L, 3L))
    val parts = t.changedDistinct(spark, 1L, Seq("dt"))
      .as[String].collect().toSet
    assert(parts == Set("d2", "d3"))
    // empty window → empty frame; horizon contract matches incrementalRead
    assert(t.changedDistinct(spark, 2L, Seq("k")).count() == 0L)
    t.compact(spark)
    intercept[IllegalArgumentException] { t.changedDistinct(spark, 1L, Seq("k")) }
  }

  test("incrementalRead resolves against full history (stale late version)") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 5, "newest"))) // commit 1 carries ver 5
    t.upsert(frame(row(1, "d1", 3, "stale")))  // commit 2 replays an older ver
    // key 1 IS changed since commit 1, but its current record is still
    // ver 5 — resolving only the new commits would wrongly emit "stale"
    val got = t.incrementalRead(spark, 1L).select("ver", "v")
      .as[(Long, String)].collect().toSet
    assert(got == Set((5L, "newest")))
  }

  test("incrementalRead refuses windows older than the compaction horizon") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a")))
    t.upsert(frame(row(1, "d1", 2, "a2")))
    t.compact(spark)
    t.upsert(frame(row(1, "d1", 3, "a3")))
    intercept[IllegalArgumentException] { t.incrementalRead(spark, 1L) }
    val got = t.incrementalRead(spark, 2L).select("v").as[String].collect().toSet
    assert(got == Set("a3"))
  }

  test("streamIncremental: a streaming consumer sees commits as they land") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b")))
    val q = t.streamIncremental(spark)
      .writeStream.format("memory").queryName("upsert_cdc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("upsert_cdc").select("k", "ver", "v")
        .as[(Long, Long, String)].collect().toSet
      assert(first == Set((1L, 1L, "a"), (2L, 1L, "b")))
      t.upsert(frame(row(1, "d1", 2, "a2"), row(3, "d1", 1, "c", del = true)))
      q.processAllAvailable()
      val all = spark.table("upsert_cdc").select("k", "ver", "v", "del")
        .as[(Long, Long, String, Boolean)].collect().toSet
      assert(all == Set((1L, 1L, "a", false), (2L, 1L, "b", false),
        (1L, 2L, "a2", false), (3L, 1L, "c", true)))
    } finally q.stop()
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

  test("vacuum purges expired tombstones; snapshot and newer CDC unchanged") {
    val (_, t) = freshTable()
    t.upsert(frame(row(1, "d1", 1, "a"), row(2, "d1", 1, "b"), row(3, "d2", 1, "c")))
    t.upsert(frame(row(1, "d1", 2, "x", del = true)))       // c2: delete k1
    t.compact(spark)                                        // tombstone → base
    t.upsert(frame(row(3, "d2", 2, "gone", del = true)))    // c3: delta delete
    val snapBefore = t.snapshot(spark).select("k", "v")
      .as[(Long, String)].collect().toSet
    // Retention horizon 3: the c2 tombstone (k1) has expired; the c3
    // delete lives in a delta dir and must survive.
    val purged = t.vacuum(spark, beforeCommit = 3L)
    assert(purged == 1L)
    assert(t.snapshot(spark).select("k", "v")
      .as[(Long, String)].collect().toSet == snapBefore)
    // CDC from the horizon still carries the newer delete signal…
    val cdc = t.incrementalRead(spark, sinceCommit = 2L, includeDeletes = true)
      .select("k", "del").as[(Long, Boolean)].collect().toSet
    assert(cdc == Set((3L, true)))
    // …and the expired tombstone row is physically gone from the base.
    val baseRows = spark.read.parquet(s"${t.path}/base")
      .select("k").as[Long].collect().toSet
    assert(!baseRows.contains(1L))
    // Idempotent: nothing left to purge.
    assert(t.vacuum(spark, beforeCommit = 3L) == 0L)
  }
}
