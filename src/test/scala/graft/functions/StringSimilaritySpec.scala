package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerKernel.similarityE6(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("literature vectors and DuckDB-pinned edge rules") {
    assert(jw("martha", "marhta") == 961111L)
    assert(jw("dixon", "dicksonx") == 813333L)
    assert(jw("crate", "trace") == 733333L)   // no shared prefix → raw Jaro
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(jw("aaxxxx", "aayyyy") == 555556L)
    assert(jw("abc", "abc") == 1000000L)
    assert(jw("a", "b") == 0L)
    // DuckDB scores ANY empty side 0, including both-empty
    assert(jw("", "") == 0L && jw("ab", "") == 0L)
    // symmetry
    assert(jw("dixon", "dicksonx") == jw("dicksonx", "dixon"))
  }

  test("registered SQL function rides codegen") {
    StringSimilarity.register(spark)
    val got = Seq(("martha", "marhta"), ("red widget", "red widget"))
      .toDF("a", "b")
      .selectExpr("graft_jaro_winkler_e6(a, b) AS s")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(961111L, 1000000L))
  }
}
