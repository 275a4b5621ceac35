package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q343's cost — u-estimation aggregates, blocked
  * pair join cardinality, scoring + histogram. */
object Q343Probe {
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
    val c = graft.Tables.load(spark, sfDir, "customer")
    val aSide = c.select(col("c_custkey").as("rid"),
      col("c_nationkey").as("blk"),
      lower(col("c_name")).as("k_name"),
      expr("CAST(round(c_acctbal*100) AS BIGINT) div 10000").as("k_bal"),
      col("c_mktsegment").as("k_seg"))
    val bSide = c.select(col("c_custkey").as("rid"),
      col("c_nationkey").as("blk"),
      when(col("c_custkey") % 11 === 0,
        concat(lower(col("c_name")), lit("x")))
        .otherwise(lower(col("c_name"))).as("k_name"),
      expr("(CAST(round(c_acctbal*100) AS BIGINT)" +
        " + (c_custkey % 7 - 3) * 600) div 10000").as("k_bal"),
      when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("k_seg"))
    tm("a count")(println("a=" + aSide.count()))
    val scored = tm("fs build + u estimation (eager checkpoint inside)") {
      graft.operators.RecordLinkage.fellegiSunterScores(aSide, bSide,
        "rid", Seq("blk"),
        Seq(("k_name", 900000L), ("k_bal", 850000L), ("k_seg", 800000L)))
    }
    tm("pair join count")(println("pairs=" + scored.count()))
    val hist = scored
      .withColumn("bucket",
        expr("(score_e6 + 1024000000) div 1000000 - 1024"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("id_a") === col("id_b"), 1L).otherwise(0L))
          .as("n_true"))
    tm("histogram")(hist.collect().foreach(r => println("  " + r)))
    hist.explain("formatted")
    spark.stop()
  }
}
