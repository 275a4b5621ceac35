package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r15 verdict item 1): decompose the UpsertTable maintenance
  * cluster — q209_time_travel_diff (8.3 s warm), q50_upsert_snapshot
  * (7.5 s), q54_derived_agg (~4 s) — into per-stage walls. Runs the q50
  * scenario (orders → c1 full load, c2 update+delete, compact, c3
  * resurrect) twice in one JVM: rep 1 is cold, rep 2 is the warm wall
  * regression triage reads. Prints one line per stage per rep.
  *
  * Questions this answers:
  *   1. write path (3 upserts + compact) vs read path (snapshot/diff) —
  *      where do the ~8 s go?
  *   2. is q209's rebuild of the SAME table q50 already built the real
  *      cost (→ shared scenario materialization, the BT-duels pattern)?
  *   3. within one upsert, metadata fs ops vs the Spark write job.
  */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm, mirroring Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "orders").count()

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ${if (rep == 1) "(cold)" else "(warm)"} ===")
      val base = graft.Tables.load(spark, sfDir, "orders").select(
        col("o_orderkey").as("k"),
        date_format(col("o_orderdate"), "yyyy-MM").as("dt"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tm(s"r$rep base_materialize")(base.count())
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val c2 = base.where(col("k") % 7 === 0 || col("k") % 13 === 0)
        .withColumn("price_cents", col("price_cents") + 1000L)
        .withColumn("ver", lit(2L)).withColumn("del", col("k") % 13 === 0)
      val c3 = base.where(col("k") % 21 === 0)
        .withColumn("price_cents", col("price_cents") + 5000L)
        .withColumn("ver", lit(3L)).withColumn("del", lit(false))
      val root = "/tmp/graft_probe_upsert_" + System.nanoTime()
      val ut = new graft.sinks.UpsertTable(root + "/t", Seq("k"), "ver",
        Seq("dt"), Some("del"))
      tm(s"r$rep upsert_c1")(ut.upsert(c1))
      val s2 = tm(s"r$rep upsert_c2")(ut.upsert(c2))
      tm(s"r$rep compact")(ut.compact(spark))
      val s3 = tm(s"r$rep upsert_c3")(ut.upsert(c3))
      tm(s"r$rep meta_lastCommitSeq_x10")((1 to 10).foreach(_ => ut.lastCommitSeq(spark)))
      // q50 tail
      tm(s"r$rep q50_snapshot_count")(
        ut.snapshot(spark).select("k", "dt", "price_cents", "ver").count())
      // q209 tail: two as-of reads + keyed full-outer diff
      val a = ut.snapshotAt(spark, s2).select("k", "dt", "price_cents", "ver")
      val b = ut.snapshotAt(spark, s3).select("k", "dt", "price_cents", "ver")
      tm(s"r$rep q209_snapA_count")(a.count())
      tm(s"r$rep q209_snapB_count")(b.count())
      tm(s"r$rep q209_diff_count")(
        graft.operators.TableDiff.diff(a, b, Seq("k")).count())
      base.unpersist()
      graft.catalog.GateSupport.deleteRecursively(new java.io.File(root))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
