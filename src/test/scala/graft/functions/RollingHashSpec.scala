package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("rolling min hash is stable and shift-tolerant") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running"
    val h0 = RollingHash.minWindowHash(base.getBytes("UTF-8"), 16)
    // identical text → identical fingerprint
    assert(RollingHash.minWindowHash(base.getBytes("UTF-8"), 16) == h0)
    // appending text far from the minimizing window usually keeps the min
    val shifted = "PREFIX " + base
    val h1 = RollingHash.minWindowHash(shifted.getBytes("UTF-8"), 16)
    // the original minimizing window still exists in the shifted text
    assert(h1 <= h0)
  }

  test("short inputs hash whole string; empty is 0") {
    assert(RollingHash.minWindowHash(Array.emptyByteArray, 16) == 0L)
    val h = RollingHash.minWindowHash("ab".getBytes, 16)
    assert(h != 0L)
  }

  test("expression matches scala impl through codegen") {
    RollingMinHash.register(spark)
    val got = Seq("hello rolling hash world", "x").toDF("t")
      .select(col("t"), RollingMinHash.rollingMinHash(col("t"), 8).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, h) =>
      assert(h == RollingHash.minWindowHash(s.getBytes("UTF-8"), 8))
    }
  }

  test("polyHash64: known-answer vectors (independent reference impl)") {
    // expected values computed by an independent big-integer
    // implementation of KR-mod-(2^61-1) + splitMix64 — pins both the
    // Scala kernel and (transitively) the q22 SQL oracle rendering
    val vectors = Seq(
      "" -> -2152535657050944081L,
      "a" -> 5718913436695043505L,
      "hello" -> 5958503815387553130L,
      "The quick brown fox" -> -1025265196642470560L,
      "naïve—café" -> -5087873173644491783L) // multi-byte UTF-8
    vectors.foreach { case (s, want) =>
      assert(RollingHash.polyHash64(s.getBytes("UTF-8")) == want, s"for '$s'")
    }
  }

  test("polyHash64 expression matches kernel through codegen; bits well-spread") {
    PolyHash64.register(spark)
    val toks = (0 until 512).map(i => s"token$i")
    val got = toks.toDF("t")
      .select(col("t"), PolyHash64.polyHash64(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, h) =>
      assert(h == RollingHash.polyHash64(s.getBytes("UTF-8")))
    }
    // avalanche sanity: every one of the 64 bit positions splits the 512
    // hashes non-degenerately (a KR hash without the finisher fails this
    // for the top bits, which are always zero mod 2^61-1)
    (0 until 64).foreach { j =>
      val ones = got.valuesIterator.count(h => ((h >>> j) & 1L) == 1L)
      assert(ones > 512 / 8 && ones < 512 * 7 / 8, s"bit $j degenerate: $ones/512")
    }
  }
}
