package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DispersionSpec extends SparkSpec {
  import spark.implicits._

  test("fanoNbE6: under- and over-dispersed hand censuses") {
    // u: counts 0,1,2,3,2 → n=5, S=8, Q=18, vnum = 5·18−64 = 26
    // o: counts 0,0,0,8   → n=4, S=8, Q=64, vnum = 256−64 = 192
    val df = (Seq(0L, 1L, 2L, 3L, 2L).map(("u", _)) ++
      Seq(0L, 0L, 0L, 8L).map(("o", _))).toDF("g", "c")
    val got = Dispersion.fanoNbE6(df, Seq("g"), col("c"))
      .collect().map(r => r.getString(0) -> r).toMap

    val u = got("u")
    assert((u.getLong(1), u.getLong(2)) == ((5L, 8L)))
    assert(u.getLong(3) == 1600000L) // mean 1.6
    assert(u.getLong(4) == 650000L)  // fano = 26e6 div 40
    assert(u.isNullAt(5))            // var < mean → NB undefined
    assert(u.getLong(6) == 1538461L) // p = 40e6 div 26

    val o = got("o")
    assert(o.getLong(3) == 2000000L)
    assert(o.getLong(4) == 6000000L) // fano = 192e6 div 32 = 6
    assert(o.getLong(5) == 400000L)  // r = 64e6 div 160
    assert(o.getLong(6) == 166666L)  // p = 32e6 div 192

    // Poisson-ish degenerate: all-equal counts → var 0 → fano 0,
    // NB r NULL, p NULL (vnum = 0)
    val eq = Dispersion.fanoNbE6(Seq(("e", 2L), ("e", 2L)).toDF("g", "c"),
      Seq("g"), col("c")).collect().head
    assert(eq.getLong(4) == 0L && eq.isNullAt(5) && eq.isNullAt(6))
  }

  test("taylorsLawE6: variance quadrupling when the mean doubles " +
      "fits b = 2 exactly; singleton group dropped") {
    import spark.implicits._
    // g1: {1,3} → mean 2, var 1; g2: {2,6} → mean 4, var 4; g3
    // singleton → dropped. Δln(var)/Δln(mean) = ln4/ln2 = 2.
    val df = Seq(("g1", 1L), ("g1", 3L), ("g2", 2L), ("g2", 6L),
      ("g3", 5L)).toDF("g", "x")
    val r = Dispersion.taylorsLawE6(df, col("g"), col("x"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 1L)))
    assert(r.getLong(4) == 2000000L)
  }
}
