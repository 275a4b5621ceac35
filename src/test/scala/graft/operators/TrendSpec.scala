package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls: exact sufficient statistics on a known line") {
    // y = 3x + 2 exactly → slope_num/slope_den = 3, intercept = 2
    val rows = Seq(("a", 0L, 2L), ("a", 1L, 5L), ("a", 2L, 8L),
      ("a", 3L, 11L), ("b", 1L, 7L), ("b", 1L, 9L)).toDF("g", "x", "y")
    val got = Trend.groupedOls(rows, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val (n, sx, sy, num, den, inum) = got("a")
    assert((n, sx, sy) == ((4L, 6L, 26L)))
    assert(num % den == 0 && num / den == 3L)
    assert(inum % den == 0 && inum / den == 2L)
    // all-equal x → degenerate slope_den = 0 sentinel
    assert(got("b")._5 == 0L)
  }

  test("x guard fails loudly beyond maxAbsX") {
    val rows = Seq(("a", 10L, 1L)).toDF("g", "x", "y")
    intercept[Exception] {
      Trend.groupedOls(rows, Seq("g"), col("x"), col("y"), maxAbsX = 5L)
        .collect()
    }
  }
}
