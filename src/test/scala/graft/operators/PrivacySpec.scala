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
}
