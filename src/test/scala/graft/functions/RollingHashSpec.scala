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
}
