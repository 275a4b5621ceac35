package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): decompose ONE UpsertTable-style commit write — is
  * the wall the shuffle, the per-dir file writes (serialized when AQE
  * coalesces the keyed repartition to a couple of tasks), or the
  * commit-protocol fs work? Times three physical variants of the same
  * 1M-row day-partitioned write. */
object UpsertWriteProbe {
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
    val base = graft.Tables.load(spark, sfDir, "events")
      .select(col("event_id").as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        col("user_id"),
        (round(col("value") * 100)).cast("long").as("v_cents"))
      .withColumn("ver", lit(1L)).withColumn("del", lit(false))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val n = spark.sparkContext.defaultParallelism
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val r1 = s"/tmp/graft_probe_w1_$rep" + System.nanoTime()
      tm(s"r$rep repartition(dt) write")(
        base.repartition(col("dt")).write.mode("overwrite")
          .partitionBy("dt").parquet(r1))
      val r2 = s"/tmp/graft_probe_w2_$rep" + System.nanoTime()
      tm(s"r$rep repartition($n, dt) write")(
        base.repartition(n, col("dt")).write.mode("overwrite")
          .partitionBy("dt").parquet(r2))
      val r3 = s"/tmp/graft_probe_w3_$rep" + System.nanoTime()
      tm(s"r$rep no-shuffle write")(
        base.write.mode("overwrite").partitionBy("dt").parquet(r3))
      Seq(r1, r2, r3).foreach { r =>
        val d = new java.io.File(r)
        val files = Option(d.listFiles).getOrElse(Array.empty)
          .flatMap(p => Option(p.listFiles).getOrElse(Array.empty))
          .count(_.getName.endsWith(".parquet"))
        println(s"[probe] $r parquet files: $files")
        graft.catalog.GateSupport.deleteRecursively(d)
      }
    }
    spark.stop()
  }
}
