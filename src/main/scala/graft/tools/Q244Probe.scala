package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r13): decompose q244_hits' wall time — edge build vs the
  * 4 HITS rounds — repeated k times in one JVM, reporting each rep, to
  * split algorithmic cost from host-level vCPU contention (the r12
  * verdict flagged an unexplained 2× r11→r12 wall doubling on unchanged
  * operator code). */
object Q244Probe {
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
    def tm(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $dt%.2fs")
      dt
    }
    // bench-equivalent warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.all.foreach(t => graft.Tables.load(spark, sfDir, t).schema)
    spark.range(100000).selectExpr("cast(id % 97 as string) AS q")
      .groupBy("q").count().count()
    for (r <- 1 to reps) {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val or = graft.Tables.load(spark, sfDir, "orders")
      var edges: org.apache.spark.sql.DataFrame = null
      val tEdge = tm(s"rep$r edges build+distinct+persist") {
        edges = li.join(or, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_suppkey"))
        edges = edges.select(col("o_custkey").as("src"),
            col("l_suppkey").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        edges.count(): Unit
      }
      val tHits = tm(s"rep$r full hitsE6 (4 rounds)") {
        graft.operators.Graph.hitsE6(edges, "src", "dst", 4).count(): Unit
      }
      println(f"[probe] rep$r TOTAL: ${tEdge + tHits}%.2fs")
      edges.unpersist()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
