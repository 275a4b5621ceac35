package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r13): repeat q97_ingest_rounds and q158_hybrid_rrf k
  * times in one JVM — cold-vs-warm split for the r12 wall-regression
  * triage (companion to Q244Probe). */
object Q97Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
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
    for (r <- 1 to reps; q <- Seq("q97_ingest_rounds", "q158_hybrid_rrf")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[probe] rep$r $q: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      graft.SparkEntry.cleanupQueryTmp()
      System.gc()
    }
    spark.stop()
  }
}
