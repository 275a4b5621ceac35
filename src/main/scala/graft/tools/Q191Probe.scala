package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage walls of q191_erasure (the last UpsertTable-
  * family gate without a decomposition) — same scenario as the gate:
  * events → day-partitioned src, full load, erase commit, two derived
  * refreshes, final snapshots. */
object Q191Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "events").count()

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val base = graft.Tables.load(spark, sfDir, "events")
        .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))
        .select(col("event_id").as("k"),
          date_format(col("ts"), "yyyy-MM-dd").as("dt"),
          col("user_id"),
          (round(col("value") * 100)).cast("long").as("v_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tm(s"r$rep base")(base.count())
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val erase = base.where(col("user_id") % 9 === 0)
        .withColumn("ver", lit(2L)).withColumn("del", lit(true))
      val root = "/tmp/graft_probe_q191_" + System.nanoTime()
      val src = new graft.sinks.UpsertTable(s"$root/src", Seq("k"), "ver",
        Seq("dt"), Some("del"))
      val drv = new graft.sinks.UpsertTable(s"$root/drv", Seq("dt"),
        "__ver", Nil, Some("__dead"))
      val derived = new graft.sinks.DerivedAggTable(src, drv, Seq("dt"),
        df => df.groupBy("dt").agg(count(lit(1)).as("n"),
          sum("v_cents").as("cents"),
          countDistinct("user_id").as("n_users")),
        s"$root/_ckpt")
      tm(s"r$rep upsert_c1")(src.upsert(c1))
      tm(s"r$rep refresh_1")(derived.refresh(spark))
      tm(s"r$rep upsert_erase")(src.upsert(erase))
      tm(s"r$rep refresh_2")(derived.refresh(spark))
      tm(s"r$rep residue+snapshot")(
        drv.snapshot(spark).select("dt", "n", "cents", "n_users")
          .crossJoin(broadcast(src.snapshot(spark)
            .where(col("user_id") % 9 === 0)
            .agg(count(lit(1)).as("residue_rows"))))
          .count())
      base.unpersist()
      graft.catalog.GateSupport.deleteRecursively(new java.io.File(root))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
