package graft.operators

import graft.SparkSpec

/** The keyed diff must classify inserts/deletes/updates exactly, treat
  * NULL-valued columns null-safely, drop unchanged keys, and support
  * composite keys. */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classification is exact; unchanged keys drop; nulls compare null-safe") {
    val old = Seq(
      (1L, Some("a"), Some(10L)), // unchanged
      (2L, Some("b"), None),      // unchanged (null payload both sides)
      (3L, Some("c"), Some(30L)), // updated value
      (4L, None, Some(40L)),      // updated null→value
      (5L, Some("e"), Some(50L))) // deleted
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Option.empty[Long]),
      (3L, Some("c"), Some(31L)),
      (4L, Some("d"), Some(40L)),
      (6L, Some("f"), Some(60L))) // inserted
      .toDF("k", "s", "v")
    val got = TableDiff.diff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "update", 4L -> "update",
      5L -> "delete", 6L -> "insert"))
  }

  test("composite keys and column order independence") {
    val old = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("a", "b", "v")
    val neu = Seq((1L, "x", 10L), (1L, "z", 30L)).toDF("a", "b", "v")
      .select("b", "v", "a") // shuffled column order must not matter
    val got = TableDiff.diff(old, neu, Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got == Map((1L, "y") -> "delete", (1L, "z") -> "insert"))
  }

  test("mismatched schemas are rejected") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, 2L)).toDF("k", "n")
    intercept[IllegalArgumentException](TableDiff.diff(a, b, Seq("k")))
  }

  test("scd2History: repeats collapse, intervals chain, current open") {
    // key a: x@10, x@20 (collapses), y@30, x@40 — three versions
    // key b: single value — one open version
    val rows = Seq(
      ("a", "x", 10L, 1L), ("a", "x", 20L, 2L), ("a", "y", 30L, 3L),
      ("a", "x", 40L, 4L), ("b", "z", 5L, 5L))
      .toDF("k", "v", "ts", "id")
    val got = TableDiff.scd2History(rows, "k", "v", "ts", "id")
      .collect().map(r => (r.getString(0), r.getLong(4)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(got(("a", 1L)) == (("x", 10L, 30L, false)))
    assert(got(("a", 2L)) == (("y", 30L, 40L, false)))
    assert(got(("a", 3L)) == (("x", 40L, -1L, true)))
    assert(got(("b", 1L)) == (("z", 5L, -1L, true)))
    assert(got.size == 4)
  }

  test("scd2History ties on ts resolve through the tie column") {
    val rows = Seq(("k", "p", 10L, 2L), ("k", "q", 10L, 1L))
      .toDF("k", "v", "ts", "id")
    val got = TableDiff.scd2History(rows, "k", "v", "ts", "id")
      .collect().map(r => r.getLong(4) -> (r.getString(1), r.getBoolean(5)))
      .toMap
    // id 1 (q) precedes id 2 (p) at the same ts
    assert(got(1L) == (("q", false)) && got(2L) == (("p", true)))
  }

  test("checksum: order/partitioning-invariant, edit-sensitive, null-tokened") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, null, 30L))
    def sum3(df: org.apache.spark.sql.DataFrame) = {
      val r = TableDiff.checksum(df, Seq("k", "s", "v")).head()
      (r.getLong(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger))
    }
    val base = sum3(rows.toDF("k", "s", "v"))
    assert(base._1 == 3L)
    // row order and partitioning must not matter
    assert(sum3(rows.reverse.toDF("k", "s", "v").repartition(7)) == base)
    // a single-field edit must move the fingerprint
    val edited = sum3(Seq((1L, "a", 10L), (2L, "b", 21L), (3L, null, 30L))
      .toDF("k", "s", "v"))
    assert(edited != base)
    // NULL is a value, not an empty string: (3,null,30) ≠ (3,"",30)
    val empt = sum3(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "", 30L))
      .toDF("k", "s", "v"))
    assert(empt != base)
    // empty input → zeros, not nulls
    val z = sum3(rows.toDF("k", "s", "v").where(col("v") > 100))
    assert(z == ((0L, 0L, BigInt(0))))
  }
}
