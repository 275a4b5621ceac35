package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-pass profile must report exact per-column stats, handle nulls
  * and heterogeneous types, and scan the source exactly once. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10L)),
    (2L, Some("b"), None),
    (3L, None, Some(30L)),
    (4L, Some("a"), Some(10L))).toDF("id", "s", "v")

  test("stats are exact per column") {
    val got = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
    assert(got.keySet == Set("id", "s", "v"))
  }

  test("distinct counts ride hash aggregates, not the multi-distinct rewrite") {
    val plan = Profile.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // the single-agg countDistinct formulation plans a set-buffered
    // aggregate over a k×-expanded scan (measured 13s vs 3s at sf0.1);
    // the pair pipeline must collapse map-side in plain HashAggregates.
    // (pass 1's KEYLESS SortAggregate is fine — string min/max buffers
    // force it, and with no grouping keys nothing is sorted.)
    assert(!plan.contains("Expand"), s"multi-distinct expand:\n$plan")
    assert(!plan.contains("Union"), s"per-column scans unioned:\n$plan")
    assert(plan.contains("HashAggregate(keys=[column"),
      s"distinct pipeline not hash-aggregated:\n$plan")
  }

  test("checks report exact violation counts for every constraint kind") {
    val child = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"), (None, "d"))
      .toDF("fk", "payload")
    val parent = Seq(1L, 3L).toDF("pk")
    val got = Profile.checks(child,
        completeness = Seq("fk", "payload"),
        uniqueness = Seq("fk", "payload"),
        referential = Seq(("fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(got("complete:fk") == ((1L, false)))
    assert(got("complete:payload") == ((0L, true)))
    // count(fk)=3 non-null, 2 distinct → 1 duplicate
    assert(got("unique:fk") == ((1L, false)))
    assert(got("unique:payload") == ((0L, true)))
    // fk=2 has no parent (one row); the NULL fk is not a violation
    assert(got("ref:fk->pk") == ((1L, false)))
    assert(got.size == 5)
  }

  test("all-null and empty frames profile without errors") {
    val nulls = Seq[(java.lang.Long, String)]((null, null), (null, null))
      .toDF("a", "b")
    val got = Profile.profile(nulls, Seq("a", "b")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.isNullAt(4)))).toMap
    assert(got("a") == ((2L, 2L, 0L, true)))
    val empty = Profile.profile(nulls.where(lit(false)), Seq("a"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(empty.toSeq == Seq((0L, 0L, 0L)))
  }

  test("momentProfile: exact sufficient statistics, null rows dropped, partition-invariant") {
    val rows = Seq(
      ("g1", Some(2L), Some(10L)), ("g1", Some(4L), Some(20L)),
      ("g1", Some(6L), Some(31L)), ("g1", None, Some(5L)),
      ("g2", Some(-3L), Some(7L)), ("g2", Some(3L), Some(-7L)))
    def model(g: String) = {
      val xs = rows.filter(r => r._1 == g && r._2.isDefined && r._3.isDefined)
        .map(r => (r._2.get, r._3.get))
      val n = xs.size.toLong
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val (sxx, syy, sxy) = (xs.map(v => v._1 * v._1).sum,
        xs.map(v => v._2 * v._2).sum, xs.map(v => v._1 * v._2).sum)
      (n, sx, sy, sxx, syy, sxy,
        n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "x", "y").repartition(parts)
      val got = Profile.momentProfile(df, "g", col("x"), col("y"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9))).toMap
      assert(got == Map("g1" -> model("g1"), "g2" -> model("g2")), s"parts=$parts")
    }
    // perfect positive linear relation: corr_num^2 == var_x_num*var_y_num
    val lin = (1L to 9L).map(i => ("L", i, 3 * i + 1)).toDF("g", "x", "y")
    val r = Profile.momentProfile(lin, "g", col("x"), col("y")).collect().head
    val (vx, vy, cn) = (r.getLong(7), r.getLong(8), r.getLong(9))
    assert(cn * cn == vx * vy && cn > 0)
  }

  test("exactAuc: perfect/inverted/chance separation and midrank ties") {
    def auc(rows: Seq[(Long, Boolean)], parts: Int = 5): (Long, Long) = {
      val r = Profile.exactAuc(rows.toDF("s", "y").repartition(parts),
        col("s"), col("y")).collect().head
      (r.getLong(2), r.getLong(3))
    }
    // perfect: positives all score higher → AUC = 1
    val perfect = (1L to 5L).map(s => (s, false)) ++
      (6L to 10L).map(s => (s, true))
    val (pn, pd) = auc(perfect); assert(pn == pd && pd == 2L * 5 * 5)
    // inverted → 0
    val (in_, _) = auc(perfect.map { case (s, y) => (s, !y) })
    assert(in_ == 0L)
    // all-tied scores → midranks give exactly 1/2
    val tied = Seq((7L, true), (7L, true), (7L, false), (7L, false))
    val (tn, td) = auc(tied); assert(tn * 2 == td)
    // hand case with a partial tie: scores pos {2,3}, neg {1,3}
    // ranks: 1→1, {3,3} midrank 3.5, 2→2; ΣR+ = 2 + 3.5 = 5.5
    // AUC = (5.5 − 3)/4 = 0.625 → num/den = 5/8 → (2ΣR+−n+(n++1)) = 5, den 8
    val (hn, hd) = auc(Seq((2L, true), (3L, true), (1L, false), (3L, false)))
    assert((hn, hd) == ((5L, 8L)))
  }

  test("wilsonLowerBound: same point rate, more evidence, higher bound") {
    val rows = (0 until 10).map(i => ("small", i < 9)) ++
      (0 until 1000).map(i => ("large", i < 900)) ++
      Seq(("zero", false), ("zero", false), ("full", true))
    val got = Profile.wilsonLowerBound(rows.toDF("g", "ok"), "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // p̂ = 0.9 both, but n=1000 must beat n=10 decisively
    assert(got("small")._3 < got("large")._3)
    assert(got("large")._3 > 870000L && got("large")._3 < 900000L)
    assert(got("small")._3 < 800000L)
    // closed-form spot check at n=10, pass=9, z=1.96
    val (n, pass, z) = (10.0, 9.0, 1.96)
    val p = pass / n
    val lb = (p + z * z / (2 * n) -
      z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
    assert(got("small")._3 == math.round(lb * 1e6))
    // degenerate rates stay inside [0, 1e6]
    assert(got("zero")._3 >= 0L && got("full")._3 <= 1000000L)
  }

  test("gapHistogram: buckets, tail cap, deterministic tie order") {
    val rows = Seq(
      ("u1", 0L, 1L, "a"), ("u1", 30000L, 2L, "b"),   // gap 30s → bucket 0
      ("u1", 150000L, 3L, "a"),                        // gap 120s → bucket 2
      ("u1", 9999999L, 4L, "c"),                       // huge → capped 60
      ("u2", 100L, 5L, "a"),                           // first event: no gap
      // tie at ts 200: id order decides which row carries the gap
      ("u2", 200L, 6L, "x"), ("u2", 200L, 7L, "y"))
      .toDF("u", "ts", "id", "et")
    val got = Profile.gapHistogram(rows, "u", "ts", "id", "et", 60000L, 60L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("b", 0L)) == ((1L, 30000L, 30000L)))
    assert(got(("a", 2L)) == ((1L, 120000L, 120000L)))
    assert(got(("c", 60L)) == ((1L, 9849999L, 9849999L)))
    assert(got(("x", 0L)) == ((1L, 100L, 100L)))   // ts 200 id 6 after 100
    assert(got(("y", 0L)) == ((1L, 0L, 0L)))       // tie gap 0 on id 7
    assert(got.size == 5)
  }

  test("percentRankPpm: exact percent_rank with duplicate values") {
    val rows = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L), (5L, 30L))
      .toDF("id", "v")
    val got = Profile.percentRankPpm(rows, "id", col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // below counts: v=10 → 0; v=20 → 2; v=30 → 3; n−1 = 4
    assert(got(1L) == 0L && got(2L) == 0L)
    assert(got(3L) == 500000L)
    assert(got(4L) == 750000L && got(5L) == 750000L)
    // single row pins 0
    val one = Profile.percentRankPpm(Seq((9L, 5L)).toDF("id", "v"),
      "id", col("v")).collect()
    assert(one.head.getLong(2) == 0L)
  }

  test("twoProportionChi2: hand-checked 2x2 table") {
    // arm a: 4 users 1 success; arm b: 4 users 3 successes
    val rows = (0 until 4).map(i => (false, i < 1)) ++
      (0 until 4).map(i => (true, i < 3))
    val r = Profile.twoProportionChi2(rows.toDF("arm", "s"),
      col("arm"), col("s")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 1L, 4L, 3L)))
    // ad − bc = 1·1 − 3·3 = −8; num = 8·64 = 512; den = 4·4·4·4 = 256
    assert(r.getLong(4) == 512L && r.getLong(5) == 256L)
    // chi² = 2.0 < 3.84 — not significant, as a 4v4 shouldn't be
  }

  test("giniConcentration: closed form on known distributions") {
    // equal: y = (5,5,5,5) → G = 0; skewed: (0,0,0,12) → G = 3/4
    val rows = (1 to 4).map(u => ("eq", s"u$u", 5L)) ++
      Seq(("sk", "u1", 0L), ("sk", "u2", 0L), ("sk", "u3", 0L),
        ("sk", "u4", 12L)) ++
      // unit pre-aggregation: u1 splits 5 into 2+3
      Seq(("ag", "u1", 2L), ("ag", "u1", 3L), ("ag", "u2", 5L))
    val got = Profile.giniConcentration(rows.toDF("g", "u", "y"), "g", "u",
        col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val eq = got("eq"); assert(eq._1 == 4L && eq._3 == 0L)
    val sk = got("sk")
    assert(sk._3 * 4 == sk._4 * 3, s"G should be 3/4: $sk")
    val ag = got("ag")   // two equal units after pre-agg → G = 0
    assert(ag._1 == 2L && ag._2 == 10L && ag._3 == 0L)
  }

  test("fdAudit: exact FD shows zero violations, broken FD is censused") {
    val df = Seq(
      (1, "a", 10), (1, "a", 11),     // x=1 → y single-valued
      (2, "b", 20), (2, "c", 21),     // x=2 → two y values
      (3, null.asInstanceOf[String], 30),
      (3, "d", 31)                     // null among non-null breaks FD
    ).toDF("x", "y", "z")
    val got = Profile.fdAudit(df, Seq(("x", "y"), ("x", "x")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("x", "y")) == ((3L, 2L, 2L)))
    assert(got(("x", "x")) == ((3L, 0L, 1L)))   // trivially exact
  }

  test("cohenKappa: textbook 2×2 example and the identity-rater bound") {
    import org.apache.spark.sql.functions.col
    // classic: a=yes/no vs b=yes/no with cells yes/yes=20, yes/no=5,
    // no/yes=10, no/no=15 → po=35/50, pe=(25·30 + 25·20)/2500=1250/2500
    // → κ = (35·50 − 1250)/(2500 − 1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)((1L, 1L)) ++ Seq.fill(5)((1L, 0L)) ++
      Seq.fill(10)((0L, 1L)) ++ Seq.fill(15)((0L, 0L))
    val r = Profile.cohenKappa(rows.toDF("a", "b").repartition(7),
      col("a"), col("b")).head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 35L)
    assert(BigInt(r.getDecimal(2).toBigInteger) == 1250)
    assert(BigInt(r.getDecimal(3).toBigInteger) == 500)
    assert(BigInt(r.getDecimal(4).toBigInteger) == 1250)
    // rater agreeing with itself: κ_num = κ_den (κ = 1)
    val id = Profile.cohenKappa(rows.toDF("a", "b"), col("a"), col("a")).head()
    assert(id.getDecimal(3) == id.getDecimal(4))
  }

  test("columnStats: one-scan ANALYZE stats are exact, nulls and NDV included") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")),
      (Some(2L), None), (None, Some("b"))
    ).toDF("k", "v")
    val got = Profile.columnStats(df, Seq("k", "v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5)))))
      .toMap
    assert(got("k") == ((4L, 1L, 2L, Some("1"), Some("2"))))
    assert(got("v") == ((4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("columnStats: all-null column yields ndv 0 and null min/max") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("k", "v")
    val got = Profile.columnStats(df, Seq("v")).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L &&
      got.getLong(3) == 0L && got.isNullAt(4) && got.isNullAt(5))
  }

  test("mutualInformationE6: hand-computed 2x2 census is exact") {
    // cells (a,p):2 (a,q):1 (b,q):1 — N=4, nx={a:3,b:1}, ny={p:2,q:2}
    val df = Seq(("a","p"),("a","p"),("a","q"),("b","q")).toDF("x","y")
    val r = Profile.mutualInformationE6(df, col("x"), col("y"))
      .collect().head
    def t(nxy: Long, nx: Long, ny: Long): Long =
      nxy * math.round(math.log(nxy.toDouble * 4 / (nx * ny).toDouble) * 1e6)
    val num = t(2,3,2) + t(1,3,2) + t(1,1,2)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(BigDecimal(r.getDecimal(2)).toLongExact == num)
    assert(r.getLong(3) == num / 4)
  }

  test("chiSquareCramersV: 2x2 exact identity and corrected root") {
    val df = Seq(("a","p"),("a","p"),("a","q"),("b","q")).toDF("x","y")
    val r = Profile.chiSquareCramersV(df, col("x"), col("y"))
      .collect().head
    // chi2_e6 = 4*4e6/6 + 4e6/6 + 4e6/2 - 4e6 = 1333332 (χ² = 4/3)
    assert(r.getString(3) == "1333332")
    // V = sqrt(1333332e6/4) → isqrt(333333000000) = 577349 (0.57735)
    assert(r.getLong(4) == 577349L)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
  }
}
