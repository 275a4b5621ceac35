package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 optimization probe: q92_fuzzy_join stage decomposition — is the
  * wall the hot-gram quadratic (no stop-gram tier), and which maxGramDf
  * keeps every part name blockable while cutting the gram join?
  * Usage: Q92Probe [sfDir] */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
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
    // the gate's exact input: quarter subset of part
    val part = graft.Tables.load(spark, sfDir, "part")
      .where(col("p_partkey") % 4 === 0)
      .select(col("p_partkey"), col("p_name"))
    // gram df distribution (q=3) over part names
    val grams = part.select(explode(expr(
      "transform(sequence(1, length(p_name) - 2), i -> substring(p_name, i, 3))")).as("g"))
    val df = grams.groupBy("g").count()
    println("gram df deciles:")
    df.selectExpr("percentile(count, array(0.5,0.9,0.99,1.0)) as p").show(false)
    println("sum df^2 (pair volume proxy): " +
      df.selectExpr("sum(count*count)").first().getLong(0))
    println("len stats:")
    part.selectExpr("min(length(p_name))", "max(length(p_name))",
      "percentile(length(p_name), 0.5)").show(false)
    for (t <- Seq(None, Some(200L), Some(400L), Some(800L), Some(2000L))) {
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val n = graft.operators.FuzzyJoin.selfJoin(part, "p_partkey",
          "p_name", q = 3, maxDist = 2, maxGramDf = t).count()
        println(f"maxGramDf=$t rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2fs pairs=$n")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
