package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], maxDist: Int) =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= maxDist
    } yield (ia, ib, lev(sa, sb))).toSet

  test("matches brute force, including short-string and boundary pairs") {
    val words = Seq("almond", "almonds", "salmon", "lemon", "melon",
      "chartreuse", "chartreuze", "cat", "hat", "bat", "catt", "chartreux",
      "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
      "powder", "powdery", "pewter", "ponder", "thunder")
    val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val got = FuzzyJoin.selfJoin(rows.toDF("id", "name"), "id", "name",
        q = 3, maxDist = 2)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == brute(rows, 2))
  }

  test("pseudo-random corpus sweep stays exact") {
    // deterministic generator: perturbations of a few stems
    val stems = Seq("periwinkle", "turquoise", "vermilion", "celadon")
    val rows = (0 until 300).map { i =>
      val s = stems(i % stems.length)
      val mut = i % 5 match {
        case 0 => s
        case 1 => s.updated(i % s.length, ('a' + i % 26).toChar)
        case 2 => s.take(i % s.length) + s.drop(i % s.length + 1) // deletion
        case 3 => s.take(i % s.length) + ('a' + i % 26).toChar + s.drop(i % s.length)
        case 4 => s.reverse
      }
      (i.toLong, mut)
    }
    val got = FuzzyJoin.selfJoin(rows.toDF("id", "name"), "id", "name",
        q = 2, maxDist = 1)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == brute(rows, 1))
  }

  test("stop-gram tier stays exact under an engineered hot gram") {
    // Every string shares the hot prefix; tails are near-misses of a few
    // stems. With maxGramDf well below the corpus size, the prefix grams
    // are all dropped from blocking — matches must still be exact.
    val stems = Seq("salamander", "salamanders", "velocirapt", "velociraptor")
    val rows = (0 until 120).map { i =>
      val tail = stems(i % stems.length)
      val mut = if (i % 7 == 0) tail.updated(i % tail.length,
        ('a' + i % 26).toChar) else tail
      (i.toLong, "sharedhotprefix" + mut)
    }
    for (t <- Seq(10L, 40L)) {
      val got = FuzzyJoin.selfJoin(rows.toDF("id", "name"), "id", "name",
          q = 3, maxDist = 2, maxGramDf = Some(t))
        .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
      assert(got == brute(rows, 2), s"maxGramDf=$t")
    }
    // And the unthrottled plan agrees with itself.
    val open = FuzzyJoin.selfJoin(rows.toDF("id", "name"), "id", "name",
        q = 3, maxDist = 2)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(open == brute(rows, 2))
  }

  test("sortedNeighborhoodPairs: intra-block rank-window candidates only") {
    import org.apache.spark.sql.functions.substring
    // block = first char. Block a: aa < ab < ac < ad; block b: ba, bb.
    val df = Seq("ab", "aa", "ad", "ac", "bb", "ba", "bb").toDF("s")
    val got = FuzzyJoin.sortedNeighborhoodPairs(df, "s",
        substring(org.apache.spark.sql.functions.col("s"), 1, 1), 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("aa", "ab", 1L), ("aa", "ac", 2L), ("ab", "ac", 1L),
      ("ab", "ad", 2L), ("ac", "ad", 1L),
      ("ba", "bb", 1L)))       // never (ad, ba): blocks don't straddle
  }

  test("sortedNeighborhoodPairs: window larger than block is safe") {
    import org.apache.spark.sql.functions.lit
    val df = Seq("x", "y").toDF("s")
    val got = FuzzyJoin.sortedNeighborhoodPairs(df, "s", lit("k"), 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 1L)))
  }
}
