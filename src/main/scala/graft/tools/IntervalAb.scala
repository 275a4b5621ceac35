package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the interval-lookup crossover measurement — custom
  * broadcast-tree operator vs BroadcastNestedLoopJoin at a given dim
  * size (the q307/q318 pair pins tiny m; this measures any m).
  * Usage: graft.tools.IntervalAb [m] [sfDir] */
object IntervalAb {
  def main(args: Array[String]): Unit = {
    val m = if (args.nonEmpty) args(0).toInt else 20000
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val facts = graft.Tables.load(spark, sfDir, "events")
      .where(col("value").isNotNull)
      .select(col("event_id"), round(col("value") * 100).cast("long")
        .as("cents"))
      .persist()
    val tiers = spark.range(m).selectExpr("id AS tier",
      "(id * 2399) % 48800 AS lo", "(id * 2399) % 48800 + 5 AS hi")
    facts.count() // warm
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab] $name m=$m: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("tree-1") {
      graft.operators.IntervalLookup.join(facts, tiers, "cents", "lo", "hi")
        .groupBy(col("tier")).count().count()
    }
    time("bnlj-1") {
      facts.join(broadcast(tiers),
          col("lo") <= col("cents") && col("cents") < col("hi"))
        .groupBy(col("tier")).count().count()
    }
    time("tree-2") {
      graft.operators.IntervalLookup.join(facts, tiers, "cents", "lo", "hi")
        .groupBy(col("tier")).count().count()
    }
    time("bnlj-2") {
      facts.join(broadcast(tiers),
          col("lo") <= col("cents") && col("cents") < col("hi"))
        .groupBy(col("tier")).count().count()
    }
    spark.stop()
  }
}
