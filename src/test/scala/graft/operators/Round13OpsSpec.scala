package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed unit fixtures for the round-13 operators that are
  * otherwise oracle-gated only (SPRT, Chapman, clustering coefficient,
  * DFG conformance, LSH planner, HT certainty path, ppl bands). */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def pin(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("sprtTrajectoryE6: cumulative LLR matches the pinned constants") {
    // hour 1: 10 trials 2 successes; hour 2: 60 trials 0 successes
    // (enough failure mass to cross Wald's lower boundary)
    val rows = (1 to 10).map(i => (3600000L + i, i <= 2)) ++
      (1 to 60).map(i => (7200000L + i, false))
    val out = Sequential.sprtTrajectoryE6(rows.toDF("ts", "x"),
        expr("ts div 3600000"), col("x"),
        p0E6 = 100000L, p1E6 = 150000L, alphaE6 = 50000L, betaE6 = 50000L)
      .orderBy("bucket")
      .select("bucket", "n_cum", "s_cum", "llr_e6", "decision")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val l1 = pin(math.log((0.0 + 150000) / 100000) * 1e6)
    val l0 = pin(math.log((0.0 + 850000) / 900000) * 1e6)
    val lo = pin(math.log((0.0 + 50000) / 950000) * 1e6)
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out(0)._4 == 2 * l1 + 8 * l0)
    assert(out(1)._4 == 2 * l1 + 68 * l0)
    // 68 failure terms at ~-57k plus 2 successes at ~405k is below
    // Wald's lower boundary ln(beta/(1-alpha)) -> accept H0
    assert(out(1)._4 <= lo && out(1)._5 == "accept_h0")
    assert(out(0)._5 == "continue")
  }

  test("chapmanAudit: textbook 3/3/2 overlap") {
    val rows = Seq(("A", true, false), ("B", true, true),
      ("C", true, true), ("D", false, true))
    val r = CaptureRecapture.chapmanAudit(rows.toDF("u", "o1", "o2"),
      col("u"), col("o1"), col("o2")).collect().head
    // n1=3 n2=3 m=2: nhat = 4*4 div 3 - 1 = 4; var = 4*4*1*1 div 36 = 0
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L &&
      r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 4L && r.getLong(5) == 0L)
  }

  test("clusteringCoefficientE6: triangle plus pendant") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val r = Graph.clusteringCoefficientE6(edges.toDF("u", "v"), "u", "v")
      .collect().head
    // degs 2,2,3,1; W = 1+1+3 = 5; corners = 3; transitivity = 600000
    // local: 1e6, 1e6, 1e6 div 3 = 333333 -> mean = 2333333 div 3
    assert(r.getLong(0) == 4L)          // n_nodes
    assert(r.getLong(1) == 4L)          // n_edges
    assert(r.getLong(2) == 5L)          // wedges
    assert(r.getLong(3) == 3L)          // triangle corners = 3T
    assert(r.getLong(4) == 600000L)     // transitivity
    assert(r.getLong(5) == 3L)          // n_cc_nodes
    assert(r.getLong(6) == 777777L)     // mean local cc
  }

  test("dfgConformanceE6: off-model edge flagged, shares exact") {
    val rows = Seq(("c1", 1L, 1L, "view"), ("c1", 2L, 2L, "click"),
      ("c1", 3L, 3L, "view"))
    val out = ProcessMining.dfgConformanceE6(
        rows.toDF("c", "ts", "id", "act"),
        col("c"), col("ts"), col("id"), col("act"),
        model = Seq(("view", "click")))
      .select("from_act", "to_act", "n", "allowed", "from_total",
        "share_of_from_e6", "conforming_of_from_e6")
      .as[(String, String, Long, Boolean, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val vc = out(("view", "click"))
    assert(vc._4 && vc._5 == 1L && vc._6 == 1000000L && vc._7 == 1000000L)
    val cv = out(("click", "view"))
    assert(!cv._4 && cv._6 == 1000000L && cv._7 == 0L)
  }

  test("lshPlannerE6: (2,2) S-curve value at the 0.6 threshold") {
    val rows = Dedup.lshPlannerE6(spark, signatureSize = 4,
        thresholdE6 = 600000L)
      .select("b", "r", "p_at_threshold_e6")
      .as[(Int, Int, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(rows.keySet == Set((1, 4), (2, 2), (4, 1)))
    // p = 1 - (1 - 0.6^2)^2 = 0.5904
    assert(rows((2, 2)) == pin((1.0 - math.pow(1.0 -
      math.pow(0.6, 2.0), 2.0)) * 1e6))
  }

  test("poissonPpsAudit: certainty stratum reproduces truth exactly") {
    // expectedSample >= total size mass -> every pi = 1: the estimator
    // must return the exact population and total with zero variance
    val rows = Seq((1L, 5L, 100L), (2L, 3L, 50L), (3L, 2L, 25L))
    val r = HorvitzThompson.poissonPpsAudit(rows.toDF("u", "s", "y"),
      col("u"), col("s"), col("y"), expectedSample = 100L, salt = "t")
      .collect().head
    assert(r.getLong(0) == 3L)           // n_pop
    assert(r.getLong(1) == 175L)         // true_total
    assert(r.getLong(2) == 3L)           // n_sampled (all certainty)
    assert(r.getLong(3) == 3000000L)     // n_hat_e6 == n_pop exactly
    assert(r.getLong(4) == 175L)         // total_hat == truth
    assert(r.getLong(5) == 0L)           // zero variance
    assert(r.getLong(6) == 0L)           // zero error
  }

  test("pplFilterBands: hand add-one costs and banding") {
    val train = Seq((1L, "g", "a a b")).toDF("id", "g", "text")
    val heldout = Seq((2L, "g", "a c")).toDF("id", "g", "text")
    val r = CorpusOps.pplFilterBands(train, heldout, "text", "id", "g",
        bandNatsE6 = 500000L, maxBand = 20L)
      .collect().head
    // census a:2 b:1, N=3 V=2; cost(a)=round(-ln(3/5)e6)=510826,
    // cost(c)=round(-ln(1/5)e6)=1609438; ppl=(510826+1609438) div 2
    // = 1060132 -> band 2
    assert(r.getString(0) == "g")
    assert(r.getLong(1) == 2L)  // band
    assert(r.getLong(2) == 1L)  // n_docs
    assert(r.getLong(3) == 2L)  // n_tokens
  }
}
