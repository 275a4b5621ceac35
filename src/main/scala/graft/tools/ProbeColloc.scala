package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which stage of q125 collocations carries its wall time. */
object ProbeColloc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    time("docs count")(docs.count())
    val uni = graft.operators.CorpusOps.wordNgramsRaw(docs, "doc_id", "text", 1)
    time("uni raw count")(uni.count())
    time("uni census")(uni.groupBy(col("g")).agg(count(lit(1))).count())
    val bi = graft.operators.CorpusOps.wordNgramsRaw(docs, "doc_id", "text", 2)
    time("bi raw count")(bi.count())
    time("bi census")(bi.groupBy(col("g")).agg(count(lit(1))).count())
    time("full collocations")(
      graft.operators.TextRank.collocations(docs, "doc_id", "text", 5L, 20)
        .count())
    spark.stop()
  }
}
