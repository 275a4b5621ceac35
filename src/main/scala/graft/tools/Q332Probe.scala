package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q332's cost — co-supplier pair scan, threshold
  * aggregate, per-level frontier sizes, backward join sizes. */
object Q332Probe {
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
    def tm[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey")
    val pairs = li.join(
        li.select(col("l_orderkey"), col("l_suppkey").as("dst_supp")),
        "l_orderkey")
      .where(col("l_suppkey") =!= col("dst_supp"))
      .select(col("l_suppkey"), col("dst_supp"))
    tm("pairs count")(println("pairs=" + pairs.count()))
    val und = pairs.where(col("l_suppkey") < col("dst_supp"))
      .groupBy(col("l_suppkey"), col("dst_supp"))
      .agg(count(lit(1)).as("w")).where(col("w") >= 5)
      .select(col("l_suppkey"), col("dst_supp"))
      .persist()
    tm("und agg")(println("und=" + und.count()))
    val edges = und.unionByName(und.select(
      col("dst_supp").as("l_suppkey"), col("l_suppkey").as("dst_supp")))
      .persist()
    tm("edges")(println("edges=" + edges.count()))
    val seeds = edges.select(col("l_suppkey").as("id")).distinct()
      .where(col("id") % 5 === 1).persist()
    tm("seeds")(println("seeds=" + seeds.count()))
    // forward levels
    val e = edges.select(col("l_suppkey").as("src"), col("dst_supp").as("dst"))
      .distinct().persist()
    var levels = Vector(seeds.select(col("id").as("s"), col("id").as("v"),
      lit(1L).as("sigma")).persist())
    for (d <- 1 to 3) {
      val reached = levels.map(_.select(col("s"), col("v")))
        .reduce(_ unionByName _)
      val next = levels.last
        .select(col("s"), col("v").as("src"), col("sigma"))
        .join(e, "src")
        .groupBy(col("s"), col("dst").as("v"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(reached, Seq("s", "v"), "left_anti")
        .persist()
      tm(s"level $d")(println(s"level$d=" + next.count()))
      levels :+= next
    }
    spark.stop()
  }
}
/** Explain variant: print the gate's physical plan join strategies. */
object Q332Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q332_betweenness")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    println("[plan] joins: " + "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoop".r
      .findAllIn(plan).toList.groupBy(identity).view.mapValues(_.size).toMap)
    spark.stop()
  }
}
