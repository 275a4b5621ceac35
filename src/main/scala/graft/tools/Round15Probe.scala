package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r15 verdict item 2): decompose the two iterative graph
  * gates — q347_link_clusters (7.2 s warm) and q332_betweenness (7.3 s
  * warm) — into per-stage walls, 2 same-JVM reps (judge by the warm
  * rep). Also A/Bs the candidate fix for q332: broadcasting the counted
  * edge frame through every forward/backward level join (the q344
  * maybeBroadcast pattern — localCheckpointed levels are leaves with
  * UNKNOWN size stats, so each of the ~6 level joins otherwise shuffles
  * both sides).
  */
object Round15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
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
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.load(spark, sfDir, "lineitem").count()

    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ${if (rep == 1) "(cold)" else "(warm)"} ===")

      // ---- q332 ----
      val pairs = tm(s"r$rep q332_cosupp_shared")(
        graft.catalog.GateSupport.coSupplierPairs(spark, sfDir))
      val und = pairs
        .where(col("l_suppkey") < col("dst_supp"))
        .groupBy(col("l_suppkey"), col("dst_supp"))
        .agg(count(lit(1)).as("w")).where(col("w") >= 5)
        .select(col("l_suppkey"), col("dst_supp"))
      val edges = und.unionByName(und.select(
        col("dst_supp").as("l_suppkey"), col("l_suppkey").as("dst_supp")))
      tm(s"r$rep q332_threshold_graph")(
        println("[probe]   edges=" + edges.count()))
      val seeds = edges.select(col("l_suppkey").as("id")).distinct()
        .where(col("id") % 5 === 1)
      tm(s"r$rep q332_betweenness_total")(
        graft.operators.Graph.betweennessE6(edges, "l_suppkey", "dst_supp",
          seeds, "id", maxDepth = 3).count())

      // per-level replica of betweennessE6's loop (same code, timed)
      {
        val e = edges.select(col("l_suppkey").as("src"), col("dst_supp").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull &&
            col("src") =!= col("dst"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        tm(s"r$rep q332L_edges_persist")(e.count())
        val l0 = seeds.select(col("id").as("s")).distinct()
          .select(col("s"), col("s").as("v"), lit(1L).as("sigma"))
          .localCheckpoint(true)
        var levels = Vector(l0)
        var sizes = Vector(1L)
        var d = 1
        while (d <= 3 && sizes.last > 0) {
          val reached = levels.map(_.select(col("s"), col("v")))
            .reduce(_ unionByName _)
          val next = tm(s"r$rep q332L_fwd_level$d")(
            levels.last
              .select(col("s"), col("v").as("src"), col("sigma"))
              .join(e, "src")
              .groupBy(col("s"), col("dst").as("v"))
              .agg(sum(col("sigma")).as("sigma"))
              .join(reached, Seq("s", "v"), "left_anti")
              .localCheckpoint(true))
          levels :+= next
          sizes :+= next.count()
          println(s"[probe]   level$d rows=${sizes.last}")
          d += 1
        }
        val deepest = levels.length - 1
        var delta = levels(deepest)
          .select(col("s"), col("v"), lit(0L).as("delta"))
        var dd2 = deepest - 1
        while (dd2 >= 1) {
          val succ = levels(dd2 + 1).join(delta, Seq("s", "v"))
            .select(col("s"), col("v").as("dst"),
              col("sigma").as("ws"), col("delta").as("wd"))
          val threeWay =
            if (sizes(dd2 + 1) <= sizes(dd2))
              succ.join(e, "dst")
                .select(col("s"), col("src").as("v"), col("ws"), col("wd"))
                .join(levels(dd2), Seq("s", "v"))
            else
              levels(dd2)
                .join(e, col("v") === col("src"))
                .join(succ, Seq("s", "dst"))
          val contrib = threeWay
            .groupBy(col("s"), col("v"))
            .agg(sum(expr("sigma * (1000000 + wd) div ws")).as("delta"))
          delta = tm(s"r$rep q332L_bwd_level$dd2")(
            levels(dd2).select(col("s"), col("v"))
              .join(contrib, Seq("s", "v"), "left")
              .select(col("s"), col("v"),
                coalesce(col("delta"), lit(0L)).as("delta"))
              .localCheckpoint(true))
          dd2 -= 1
        }
        e.unpersist()
      }

      // ---- q347 ----
      val (aSide, bSide) = tm(s"r$rep q347_sides_shared")(
        graft.catalog.GateSupport.q343Sides(spark, sfDir))
      val scored = graft.operators.RecordLinkage.fellegiSunterScores(
        aSide, bSide, "rid", Seq("blk"),
        Seq(("k_name", 900000L), ("k_bal", 850000L), ("k_seg", 800000L)))
      val links = scored
        .where(col("score_e6") >= 3000000L && col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tm(s"r$rep q347_score_and_link")(
        println("[probe]   links=" + links.count()))
      val comps = tm(s"r$rep q347_components")(
        graft.operators.Graph.alternatingComponents(links, "id_a", "id_b"))
      tm(s"r$rep q347_census_tail")(
        comps.groupBy(col("component")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters")).count())
      // A/B: Dedup.connectedComponents takes the bounded-fetch union-find
      // fast path at <=4M edges — link graphs are tiny-diameter, so the
      // star rounds' per-iteration job floor may be pure overhead here
      tm(s"r$rep q347_components_unionfind")(
        graft.operators.Dedup.connectedComponents(links, "id_a", "id_b")
          .groupBy(col("component")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters")).count())
      links.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
