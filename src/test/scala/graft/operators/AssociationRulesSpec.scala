package graft.operators

import graft.SparkSpec

class AssociationRulesSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {A,B} {A,B} {A,C} {B}; N=4, s(A)=3 s(B)=3 s(C)=1,
  // s(A,B)=2 s(A,C)=1.
  private val df = Seq(
    (1, "A"), (1, "B"),
    (2, "A"), (2, "B"), (2, "B"), // dup item collapses
    (3, "A"), (3, "C"),
    (4, "B")
  ).toDF("b", "i")

  test("support, confidence ppm, and lift ppm are exact integers") {
    val got = AssociationRules.rules(df, "b", "i", minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // A→B: s=2, conf=2/3→666666, lift=2·4/(3·3)→888888
    assert(got(("A", "B")) == ((2L, 3L, 666666L, 888888L)))
    assert(got(("B", "A")) == ((2L, 3L, 666666L, 888888L)))
    // A→C: s=1, conf=1/3→333333, lift=1·4/(3·1)→1333333
    assert(got(("A", "C")) == ((1L, 3L, 333333L, 1333333L)))
    // C→A: conf=1/1→1000000
    assert(got(("C", "A")) == ((1L, 1L, 1000000L, 1333333L)))
    assert(!got.contains(("B", "C")))
  }

  test("minSupport filters; hub baskets are dropped whole") {
    val withHub = df.union(
      Seq((9, "A"), (9, "B"), (9, "C"), (9, "D")).toDF("b", "i"))
    // maxBasketSize=3 drops basket 9 entirely → same rules as before,
    // and D never appears.
    val got = AssociationRules.rules(withHub, "b", "i",
        minSupport = 2L, maxBasketSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "B"), ("B", "A")))
  }

  test("frequentTriples: downward-closure pruning returns the exact census") {
    import org.apache.spark.sql.functions.col
    // (a,b,c) ×2, (a,b,d) ×1; duplicates within a basket collapse
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "d"))
    val got = AssociationRules.frequentTriples(
        rows.toDF("b", "i").repartition(4), "b", "i", minSupport = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(got == Map(("a", "b", "c") -> 2L))
    // minSupport above the max triple support → empty, not an error
    assert(AssociationRules.frequentTriples(rows.toDF("b", "i"), "b", "i",
      minSupport = 3L).count() == 0L)
  }
}
