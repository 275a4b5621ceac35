package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q196's cost — which of the cascade's steps
  * (source upserts, daily/weekly derived refreshes, final snapshot) the
  * ~10 s actually goes to, at a given SF. */
object Q196Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm (codegen/parquet-footer paths), mirroring Bench
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "events").count()

    val ev = graft.Tables.load(spark, sfDir, "events")
    val base = ev.select(
      col("event_id").as("k"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      expr("cast(cast(unix_millis(ts) as bigint) div 432000000 as string)")
        .as("wk"),
      (round(col("value") * 100)).cast("long").as("v_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tm("base materialize")(base.count())
    val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
    val c2 = base.where(col("k") % 11 === 0)
      .withColumn("v_cents", col("v_cents") + 500L)
      .withColumn("ver", lit(2L)).withColumn("del", lit(false))
    val root = "/tmp/graft_probe_q196_" + System.nanoTime()
    val src = new graft.sinks.UpsertTable(s"$root/src", Seq("k"), "ver",
      Seq("day"), Some("del"))
    val drvDay = new graft.sinks.UpsertTable(s"$root/day", Seq("day"),
      "__ver", Seq("wk"), Some("__dead"))
    val drvWk = new graft.sinks.UpsertTable(s"$root/wk", Seq("wk"), "__ver",
      Nil, Some("__dead"))
    val daily = new graft.sinks.DerivedAggTable(src, drvDay, Seq("day"),
      df => df.groupBy("day")
        .agg(count(lit(1)).as("n"), sum("v_cents").as("cents"))
        .withColumn("wk", expr(
          "cast((unix_date(to_date(day)) * 86400000L) div 432000000 as string)"))
        .select(col("day"), col("wk"), col("n"), col("cents")),
      s"$root/_ckpt_day")
    val weekly = new graft.sinks.DerivedAggTable(drvDay, drvWk, Seq("wk"),
      df => df.groupBy("wk").agg(sum("n").as("n"),
        sum("cents").as("cents"), count(lit(1)).as("n_days")),
      s"$root/_ckpt_wk")
    tm("upsert c1")(src.upsert(c1))
    tm("  [decomp] changedDistinct collect")(
      src.changedDistinct(spark, 0L, Seq("day")).collect().length)
    tm("  [decomp] snapshot resolve+agg")(
      src.snapshot(spark).groupBy("day")
        .agg(count(lit(1)).as("n"), sum("v_cents").as("cents")).count())
    tm("refresh day 1")(daily.refresh(spark))
    tm("refresh wk 1")(weekly.refresh(spark))
    tm("upsert c2")(src.upsert(c2))
    tm("refresh day 2")(daily.refresh(spark))
    tm("refresh wk 2")(weekly.refresh(spark))
    tm("final snapshot")(
      println("rows=" + drvWk.snapshot(spark).count()))
    spark.stop()
  }
}
