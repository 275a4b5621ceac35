package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r16): per-phase walls of q332_betweenness — edge build
  * (co-supplier groupBy + threshold), symmetrize+distinct, the three
  * forward BFS levels, and the two backward accumulation rounds. The
  * r15 verdict asked for a pivot-batched frontier; the forward pass
  * already IS (s, v)-batched, so this probe pins where the residual
  * actually goes before any rewrite. */
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
    spark.range(1000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val pairs = graft.catalog.GateSupport.coSupplierPairs(spark, sfDir)
      val und = pairs
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      val edges = und.unionByName(und.select(
        col("dst_supp").as("l_suppkey"), col("l_suppkey").as("dst_supp")))
      val seeds = edges.select(col("l_suppkey").as("id")).distinct()
        .where(col("id") % 5 === 1)
      tm(s"r$rep und+seeds count")(println(
        s"  edges=${edges.count()} seeds=${seeds.count()}"))

      // mirror betweennessE6 with per-level timing
      val e = edges.select(col("l_suppkey").as("src"), col("dst_supp").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tm(s"r$rep e materialize")(e.count())
      val l0 = seeds.select(col("id").as("s"), col("id").as("v"),
        lit(1L).as("sigma")).localCheckpoint(true)
      var levels = Vector(l0)
      var sizes = Vector(1L)
      var d = 1
      while (d <= 3 && sizes.last > 0) {
        val reached = levels.map(_.select(col("s"), col("v")))
          .reduce(_ unionByName _)
        val next = tm(s"r$rep forward level $d")(levels.last
          .select(col("s"), col("v").as("src"), col("sigma"))
          .join(e, "src")
          .groupBy(col("s"), col("dst").as("v"))
          .agg(sum(col("sigma")).as("sigma"))
          .join(reached, Seq("s", "v"), "left_anti")
          .localCheckpoint(true))
        levels :+= next
        sizes :+= tm(s"r$rep forward level $d count")(next.count())
        println(s"  level $d size=${sizes.last}")
        d += 1
      }
      val deepest = levels.length - 1
      var delta = levels(deepest)
        .select(col("s"), col("v"), lit(0L).as("delta"))
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      var dd = deepest - 1
      while (dd >= 1) {
        val succ = levels(dd + 1).join(delta, Seq("s", "v"))
          .select(col("s"), col("v").as("dst"),
            col("sigma").as("ws"), col("delta").as("wd"))
        val threeWay =
          if (sizes(dd + 1) <= sizes(dd))
            succ.join(e, "dst")
              .select(col("s"), col("src").as("v"), col("ws"), col("wd"))
              .join(levels(dd), Seq("s", "v"))
          else
            levels(dd)
              .join(e, col("v") === col("src"))
              .join(succ, Seq("s", "dst"))
        val contrib = threeWay
          .groupBy(col("s"), col("v"))
          .agg(sum(expr("sigma * (1000000 + wd) div ws")).as("delta"))
        delta = tm(s"r$rep backward level $dd")(levels(dd)
          .select(col("s"), col("v"))
          .join(contrib, Seq("s", "v"), "left")
          .select(col("s"), col("v"),
            coalesce(col("delta"), lit(0L)).as("delta"))
          .localCheckpoint(true))
        acc = Some(acc.map(_.unionByName(delta)).getOrElse(delta))
        dd -= 1
      }
      tm(s"r$rep final agg")(println("  out=" +
        acc.get.groupBy(col("v").as("node"))
          .agg(sum(col("delta")).as("bc_e6")).count()))
      e.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
