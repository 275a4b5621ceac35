import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
val spark = SparkSession.builder().master("local[32]").config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false").getOrCreate()
spark.sparkContext.setLogLevel("WARN")
val dir = "/root/testdata/sf0.1"
def time[T](label: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(s"$label: ${(System.nanoTime()-t0)/1e9}s"); r }
spark.range(1000).selectExpr("sum(id)").collect()
val q24 = graft.SparkEntry.queries("q24_query_hash")
time("q24-run1")(q24(spark, dir).count())
time("q24-run2")(q24(spark, dir).count())
time("q24-run3")(q24(spark, dir).count())
