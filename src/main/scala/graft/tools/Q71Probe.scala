package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): decompose q71_bloom_join — bloom build, BNLJ+filter
  * prune, exact semi-join, final agg — and compare against the plain
  * (un-pruned) semi-join to see what the explicit filter pattern costs
  * at sf0.1. */
object Q71Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.agg.BloomSketch.register(spark)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val dim = graft.Tables.load(spark, sfDir, "orders")
        .where(col("o_totalprice") > 400000).select("o_orderkey")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 100).cast("long")).as("revenue_cents"))
      tm(s"r$rep li scan+agg only")(
        agg(li).count())
      tm(s"r$rep plain semi+agg")(
        agg(li.join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi"))
          .count())
      tm(s"r$rep bloom build only")(
        dim.agg(graft.agg.BloomSketch.bloomBits(col("o_orderkey"),
          1 << 20, 7).as("__bloom")).count())
      tm(s"r$rep prune only")(
        operators.probeCount(spark, sfDir))
      tm(s"r$rep full gate")(
        agg(graft.operators.RuntimeFilter.bloomSemiJoin(li, "l_orderkey",
          dim, "o_orderkey", 1 << 20, 7)).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
  private object operators {
    def probeCount(spark: SparkSession, sfDir: String): Long = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val dim = graft.Tables.load(spark, sfDir, "orders")
        .where(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.RuntimeFilter.bloomPrune(li, "l_orderkey",
        dim, "o_orderkey", 1 << 20, 7).count()
    }
  }
}
