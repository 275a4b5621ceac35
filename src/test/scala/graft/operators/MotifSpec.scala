package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MotifSpec extends SparkSpec {
  import spark.implicits._

  private def brute(xs: Seq[Long], m: Int): Map[Long, (Long, Long)] = {
    val ws = xs.sliding(m).toVector
    (for (i <- ws.indices) yield {
      val cands = ws.indices.filter(j => math.abs(i - j) >= m)
        .map { j =>
          val d = ws(i).zip(ws(j)).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, j)
        }
      val (d, j) = cands.min
      (i + 1).toLong -> ((j + 1).toLong, d)
    }).toMap
  }

  test("nearest windows match brute force; repeated motif has distance 0") {
    // a repeated pattern (1,5,2,8) at positions 1 and 9
    val xs = Seq(1L, 5L, 2L, 8L, 30L, 31L, 29L, 33L, 1L, 5L, 2L, 8L, 90L)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "t", "v")
    val got = Motif.nearestWindow(df, Seq("key"), col("t"), col("v"), m = 4)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == brute(xs, 4))
    assert(got(1L) == ((9L, 0L)) && got(9L) == ((1L, 0L)))
  }

  test("keys never mix; short series emit nothing; tie breaks on smaller j") {
    val df = (Seq.tabulate(10)(i => ("a", i.toLong, 7L)) ++
      Seq(("b", 0L, 1L), ("b", 1L, 2L)))
      .toDF("key", "t", "v")
    val got = Motif.nearestWindow(df, Seq("key"), col("t"), col("v"), m = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.forall(_._1 == "a"))
    // constant series: every distance 0, neighbor = smallest legal j
    val m = got.map(r => r._2 -> r._3).toMap
    assert(m(1L) == 5L && m(5L) == 1L && m(7L) == 1L)
  }
}
