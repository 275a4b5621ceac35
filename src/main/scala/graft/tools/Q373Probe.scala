package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r13): warm-vs-cold q373 after the single-scan fix. */
object Q373Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).schema)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q373_cochran_q")(spark, sfDir).count()
      println(f"[probe] rep$r q373: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
