package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionCompareSpec extends SparkSpec {
  import spark.implicits._

  test("adjustedRandE6: identical partitions → 1; crossed → negative") {
    val same = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("p", "q")
    val s = PartitionCompare.adjustedRandE6(same, col("p"), col("q"))
      .collect().head
    assert(s.getLong(0) == 4L && s.getLong(4) == 1000000L)

    // (a,a,b,b) vs (x,y,x,y): every cell 1 → sq_ij = 0, sq_a = sq_b
    // = 4, qn = 12 → num = −16, den = 32 → ari = −500000 (toward-zero)
    val crossed = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("p", "q")
    val c = PartitionCompare.adjustedRandE6(crossed, col("p"), col("q"))
      .collect().head
    assert(BigInt(c.getDecimal(1).toBigInteger) == 0)
    assert(BigInt(c.getDecimal(2).toBigInteger) == 4)
    assert(c.getLong(4) == -500000L)

    // degenerate: one block × one block → den = 0 → NULL
    val triv = Seq(("a", "x"), ("a", "x")).toDF("p", "q")
    val t = PartitionCompare.adjustedRandE6(triv, col("p"), col("q"))
      .collect().head
    assert(t.isNullAt(4))
  }
}
