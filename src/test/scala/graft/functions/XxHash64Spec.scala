package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Public XXH64 test vectors (xxHash reference distribution / widely
  * published): seed-0 hashes of "", "abc", and a >32-byte string that
  * exercises the 4-lane main loop plus the 8/4/1-byte tails. */
class XxHash64Spec extends SparkSpec {

  test("seed-0 vectors") {
    assert(XxHash64.hashString("", 0L) == 0xEF46DB3751D8E999L)
    assert(XxHash64.hashString("abc", 0L) == 0x44BC2CF5AD770999L)
    assert(XxHash64.hashString("Nobody inspects the spammish repetition", 0L) ==
      java.lang.Long.parseUnsignedLong("fbcea83c8a378bf1", 16))
  }

  test("seed sensitivity") {
    assert(XxHash64.hashString("abc", 0L) != XxHash64.hashString("abc", 42L))
  }

  test("catalyst expression matches scala implementation and codegen runs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val got = Seq("", "abc", "Nobody inspects the spammish repetition", "graft")
      .toDF("s")
      .select(col("s"), GraftFunctions.xxhash64Seed0(col("s")).as("h"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, h) => assert(h == XxHash64.hashString(s, 0L), s"for '$s'") }
  }
}
