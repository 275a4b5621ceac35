package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    // QI (a, x): 3 records, 2 distinct sensitive values
    ("a", "x", "s1"), ("a", "x", "s1"), ("a", "x", "s2"),
    // QI (a, y): 1 record — violates k=2
    ("a", "y", "s1"),
    // QI (b, x): 2 records, same sensitive — k ok, l = 1
    ("b", "x", "s3"), ("b", "x", "s3")
  ).toDF("g1", "g2", "sens")

  test("kAnonymityAudit counts k and l per QI group") {
    val got = Privacy.kAnonymityAudit(df, Seq("g1", "g2"), "sens", 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got == Map(
      ("a", "x") -> ((3L, 2L, false)),
      ("a", "y") -> ((1L, 1L, true)),
      ("b", "x") -> ((2L, 1L, false))))
  }

  test("null sensitive counts toward k but not l") {
    val withNull = Seq(("a", "x", Option("s1")), ("a", "x", None))
      .toDF("g1", "g2", "sens")
    val r = Privacy.kAnonymityAudit(withNull, Seq("g1", "g2"), "sens", 2)
      .collect().head
    assert((r.getLong(2), r.getLong(3)) == ((2L, 1L)))
  }

  test("kAnonymitySummary: suppression cost and min l of safe groups") {
    val r = Privacy.kAnonymitySummary(df, Seq("g1", "g2"), "sens", 2)
      .collect().head
    assert(r.getLong(0) == 6L)    // n_records
    assert(r.getLong(1) == 3L)    // n_groups
    assert(r.getLong(2) == 1L)    // suppressed_records (the (a,y) single)
    assert(r.getLong(3) == 1L)    // violating_groups
    assert(r.getLong(4) == 1L)    // min l among k-satisfying = (b,x)'s 1
  }

  private def rrInput(nUsers: Int, perUser: Int) = {
    val rows = for {
      u <- 1 to nUsers; i <- 1 to perUser
    } yield (u.toLong * 1000 + i, u.toLong, "g", (u + i) % 3 == 0)
    rows.toDF("id", "user", "grp", "bit")
  }

  test("randomizedResponse bounds each user to maxPerUser contributions") {
    val out = Privacy.randomizedResponse(rrInput(20, 10), "id", "user",
      "grp", col("bit"), "s1", maxPerUser = 3).collect().head
    assert(out.getAs[Long]("n") == 60L) // 20 users x 3, not x 10
  }

  test("randomizedResponse is deterministic and the debias inverts the report") {
    val df = rrInput(50, 2)
    val a = Privacy.randomizedResponse(df, "id", "user", "grp",
      col("bit"), "s1", maxPerUser = 5).collect().head
    val b = Privacy.randomizedResponse(df, "id", "user", "grp",
      col("bit"), "s1", maxPerUser = 5).collect().head
    assert(a == b)
    val n = a.getAs[Long]("n"); val r = a.getAs[Long]("reported_true")
    assert(a.getAs[Long]("est_true_e6") ==
      math.max(r * 8 - n, 0L) * 1000000L / 6L)
  }

  test("randomizedResponse estimate tracks the true count on a large input") {
    // 3000 rows, ~1/3 true: RR std-dev for n=3000 at p=3/4 is ~30 rows,
    // so a ±200 band is a ~6.5-sigma determinism check, not a flake
    val out = Privacy.randomizedResponse(rrInput(1500, 2), "id", "user",
      "grp", col("bit"), "s1", maxPerUser = 2).collect().head
    val estRows = out.getAs[Long]("est_true_e6") / 1000000L
    val truth = out.getAs[Long]("true_count")
    assert(math.abs(estRows - truth) < 200,
      s"est $estRows vs true $truth")
  }

  test("different salts give different coins (the draws are salt-domained)") {
    val rows = for { u <- 1 to 1000 } yield
      (u.toLong, u.toLong, s"g${u % 10}", u % 3 == 0)
    val df = rows.toDF("id", "user", "grp", "bit")
    def counts(salt: String): Seq[(String, Long)] =
      Privacy.randomizedResponse(df, "id", "user", "grp",
        col("bit"), salt, 1).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("reported_true"))
        .sortBy(_._1).toSeq
    // same truth per group, different noise realization: if the salt
    // never reached the hash, all 10 group counts would coincide
    assert(counts("saltA") != counts("saltB"))
  }

  test("tClosenessAudit: hand-unrolled ordered EMD, missing categories count") {
    import org.apache.spark.sql.functions.col
    // global: s ∈ {1,2,3} each ×2 (N=6, m=3)
    // group A = {1,1}:   cums 2,2,2 → |2·6−2·2| + |2·6−4·2| = 8+4 = 12 / (2·6·2)
    // group B = {2,2,3,3}: cums 0,2,4 → |0−2·4| + |12−16|  = 8+4 = 12 / (4·6·2)
    val rows = Seq(("A", 1L), ("A", 1L),
      ("B", 2L), ("B", 2L), ("B", 3L), ("B", 3L))
    val got = Privacy.tClosenessAudit(rows.toDF("grp", "s").repartition(5),
        Seq("grp"), "s", tNum = 1, tDen = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger),
          BigInt(r.getDecimal(3).toBigInteger), r.getBoolean(4))).toMap
    // A: EMD = 12/24 = 1/2, NOT > 1/2 → no violation (strict threshold)
    assert(got("A") == ((2L, BigInt(12), BigInt(24), false)))
    // B: EMD = 12/48 = 1/4 → under t
    assert(got("B") == ((4L, BigInt(12), BigInt(48), false)))
    // a singleton group concentrated at the far end: its missing
    // categories still contribute cumulative-gap terms
    // group C = {3}: cums 0,0,1 vs global now 1:2,2:2,3:3 (N=7, m=3)
    val rows2 = rows ++ Seq(("C", 3L))
    val v = Privacy.tClosenessAudit(rows2.toDF("grp", "s"),
      Seq("grp"), "s", 1, 2).where(col("grp") === "C").head()
    // C: |0·7−2·1| + |0·7−4·1| = 6, den = 1·7·2 = 14 → 3/7 < 1/2
    assert(BigInt(v.getDecimal(2).toBigInteger) == 6 &&
      BigInt(v.getDecimal(3).toBigInteger) == 14 && !v.getBoolean(4))
  }
  test("recursiveLDiversity: ranked-tail test, distinct-l floor, NULLs") {
    // G1 counts a:5 b:2 c:1 → r1=5, tail(l=3)=1
    val rows = Seq.fill(5)(("G1", "a")) ++ Seq(("G1", "b"), ("G1", "b"),
      ("G1", "c")) ++
      Seq(("G2", "x"), ("G2", "y")) ++ // m=2 < l → fails regardless
      Seq(("G3", null), ("G3", "z"), ("G3", "z"), ("G3", "w"),
        ("G3", "u")) // null excluded: counts z:2 w:1 u:1
    val df = rows.toDF("grp", "s").repartition(4)
    def audit(cNum: Long, cDen: Long) =
      Privacy.recursiveLDiversity(df, Seq("grp"), "s", cNum, cDen, l = 3)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getBoolean(5))).toMap
    val strict = audit(2, 1) // r1 < 2·tail ⇔ 5 < 2 → fail
    assert(strict("G1") == ((8L, 3L, 5L, 1L, false)))
    assert(strict("G2")._5 == false && strict("G2")._2 == 2L)
    // G3: n counts only non-null (4), r1=2, tail=1 → 2 < 2·1 false
    assert(strict("G3") == ((4L, 3L, 2L, 1L, false)))
    val loose = audit(6, 1) // 5 < 6·1 → G1 passes
    assert(loose("G1")._5 == true)
    // G3 under c=6: 2 < 6 → passes
    assert(loose("G3")._5 == true)
  }

}
