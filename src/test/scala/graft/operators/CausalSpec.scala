package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CausalSpec extends SparkSpec {
  import spark.implicits._

  test("diffInDiff recovers a planted treatment effect exactly") {
    // control: 10 → 12 (trend +2); treated: 20 → 27 (trend +2, effect +5)
    val rows =
      Seq.fill(4)((false, false, 10L)) ++ Seq.fill(4)((false, true, 12L)) ++
      Seq.fill(3)((true, false, 20L)) ++ Seq.fill(3)((true, true, 27L))
    val r = Causal.diffInDiff(rows.toDF("tr", "po", "y"),
      col("tr"), col("po"), col("y")).collect().head
    assert(r.getAs[Long]("m_t_pre_e6") == 20000000L)
    assert(r.getAs[Long]("m_c_post_e6") == 12000000L)
    assert(r.getAs[Long]("did_e6") == 5000000L)
  }

  test("diffInDiff with an empty cell yields NULL did, not zero") {
    val rows = Seq((false, false, 10L), (false, true, 12L),
      (true, true, 30L)) // no treated-pre cell
    val r = Causal.diffInDiff(rows.toDF("tr", "po", "y"),
      col("tr"), col("po"), col("y")).collect().head
    assert(r.isNullAt(r.fieldIndex("m_t_pre_e6")))
    assert(r.isNullAt(r.fieldIndex("did_e6")))
    assert(r.getAs[Long]("n_t_pre") == 0L)
  }

  test("upliftCurve: planted top-tile effect shows only in the top tile") {
    // 40 units, score = 100−id (so tiles follow id order); treated =
    // even ids. In the top tile (ids 1..10) treated units convert, in
    // the rest nobody does → tile-1 uplift 1e6, decaying cumulatively
    val rows = (1L to 40L).map(id =>
      (id, 100L - id, id % 2 == 0, id <= 10 && id % 2 == 0))
    val got = Causal.upliftCurve(rows.toDF("u", "sc", "tr", "cv"),
      "u", org.apache.spark.sql.functions.max(col("sc")),
      col("tr"), col("cv"), nTiles = 4)
      .collect().map(r => r.getAs[Int]("tile") ->
        r.getAs[Long]("uplift_e6")).toMap
    assert(got(1) == 1000000L)
    assert(got(2) == 500000L)
    assert(got(4) == 250000L)
  }

  test("upliftCurve tiling reproduces ntile exactly, remainder cases included") {
    // The GlobalRank closed form must match engine ntile bit-for-bit —
    // including the earlier-tiles-take-the-remainder rule (n=17,t=5 →
    // 4,4,3,3,3) and the n<t degenerate (every row its own tile).
    for ((n, t) <- Seq((17, 5), (40, 4), (10, 4), (3, 7), (100, 9))) {
      val rows = (1L to n.toLong).map(id => (id, (id * 7919L) % 101L))
      val df = rows.toDF("u", "sc")
      val gotSizes = Causal.upliftCurve(df, "u",
          org.apache.spark.sql.functions.max(col("sc")),
          col("u") % 2 === 0, col("sc") > 50, nTiles = math.max(t, 2))
        .collect().map(r => r.getAs[Int]("tile") -> r.getAs[Long]("n")).toMap
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("sc").desc, col("u"))
      val wantSizes = df.withColumn("tile", ntile(math.max(t, 2)).over(w))
        .groupBy("tile").count()
        .collect().map(r => r.getAs[Int]("tile") -> r.getAs[Long]("count"))
        .toMap
      assert(gotSizes == wantSizes, s"n=$n t=$t")
    }
  }

  test("upliftCurve plans with NO window operator (single-reducer trap)") {
    val df = (1L to 50L).map(id => (id, id % 13L)).toDF("u", "sc")
    val plan = Causal.upliftCurve(df, "u",
        org.apache.spark.sql.functions.max(col("sc")),
        col("u") % 2 === 0, col("sc") > 5, nTiles = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("cupedAdjustedLift removes planted pre-period imbalance exactly") {
    // treated units: y = x + 5 with pre x ∈ {20,30}; control: y = x with
    // pre x ∈ {10,20}. Raw lift = 30−15 = 15 (10 of it pre-imbalance);
    // pooled θ = 1000/800, CUPED = 15 − θ·10 = 2.5 = 8000/3200 exactly.
    val rows = Seq(
      (1L, true, true, 20L), (1L, true, false, 25L),
      (2L, true, true, 30L), (2L, true, false, 35L),
      (3L, false, true, 10L), (3L, false, false, 10L),
      (4L, false, true, 20L), (4L, false, false, 20L))
    val r = Causal.cupedAdjustedLift(rows.toDF("u", "tr", "pre", "v"),
      col("u"), col("tr"), col("pre"), col("v")).collect().head
    def bd(n: String) = r.getAs[java.math.BigDecimal](n).longValueExact()
    assert(r.getAs[Long]("n_t") == 2L && r.getAs[Long]("n_c") == 2L)
    assert(bd("raw_num") == 60L && bd("raw_den") == 4L)      // raw = 15
    assert(bd("theta_num") == 1000L && bd("theta_den") == 800L)
    assert(bd("cuped_num") == 8000L && bd("cuped_den") == 3200L) // 2.5
  }

  test("cupedAdjustedLift flags a degenerate covariate via theta_den=0") {
    // every unit has the same pre value → var(x)=0; raw lift must still
    // be exact while theta_den==0 tells consumers θ is undefined
    val rows = Seq(
      (1L, true, true, 7L), (1L, true, false, 9L),
      (2L, false, true, 7L), (2L, false, false, 4L))
    val r = Causal.cupedAdjustedLift(rows.toDF("u", "tr", "pre", "v"),
      col("u"), col("tr"), col("pre"), col("v")).collect().head
    def bd(n: String) = r.getAs[java.math.BigDecimal](n).longValueExact()
    assert(bd("theta_den") == 0L)
    assert(bd("raw_num") == 5L && bd("raw_den") == 1L) // 9 − 4 = 5
  }

  test("postStratifiedAte: within-stratum diffs, single-arm exclusion") {
    // stratum 1 (x=1): diff 10−6 = 4e6; stratum 2 (x=2): 20−10 = 10e6;
    // stratum 3 (x=4): treated-only → NULL diff, excluded from rollup;
    // overall = (2·4e6 + 2·10e6) div 4 = 7e6
    val rows = Seq(
      (1L, true, true, 1L), (1L, true, false, 10L),
      (2L, false, true, 1L), (2L, false, false, 6L),
      (3L, true, true, 2L), (3L, true, false, 20L),
      (4L, false, true, 2L), (4L, false, false, 10L),
      (5L, true, true, 4L), (5L, true, false, 99L))
    val got = Causal.postStratifiedAte(rows.toDF("u", "tr", "pre", "v"),
        col("u"), col("tr"), col("pre"), col("v"))
      .collect().map(r => r.getAs[Long]("stratum") -> r).toMap
    assert(got(1L).getAs[Long]("diff_e6") == 4000000L)
    assert(got(2L).getAs[Long]("diff_e6") == 10000000L)
    assert(got(3L).isNullAt(got(3L).fieldIndex("diff_e6")))
    assert(got(-1L).getAs[Long]("n_units") == 4L)
    assert(got(-1L).getAs[Long]("diff_e6") == 7000000L)
  }

  test("diffInDiff truncation order is the pinned one (means first)") {
    // treated pre {1,2}: mean 1.5 → 1500000; post {2}: 2000000
    // control pre {0}: 0; post {0}: 0 → DiD = 500000 exactly in e6
    val rows = Seq((true, false, 1L), (true, false, 2L), (true, true, 2L),
      (false, false, 0L), (false, true, 0L))
    val r = Causal.diffInDiff(rows.toDF("tr", "po", "y"),
      col("tr"), col("po"), col("y")).collect().head
    assert(r.getAs[Long]("did_e6") == 500000L)
  }
}
