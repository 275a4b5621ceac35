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
}
