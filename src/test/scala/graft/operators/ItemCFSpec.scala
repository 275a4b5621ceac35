package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ItemCFSpec extends SparkSpec {
  import spark.implicits._

  test("itemSimilarity: exact co-engagement census, repeats dedupe, ordering a<b") {
    // u1: A,B,C; u2: A,B (twice — must dedupe); u3: A
    val rows = Seq(("u1", "A"), ("u1", "B"), ("u1", "C"),
      ("u2", "A"), ("u2", "B"), ("u2", "B"), ("u3", "A"))
    val got = ItemCF.itemSimilarity(rows.toDF("u", "i").repartition(5),
        col("u"), col("i"), minCooc = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // n: A=3, B=2, C=1; cooc: (A,B)=2, (A,C)=1, (B,C)=1
    assert(got(("A", "B")) == ((2L, 3L, 2L, 4L * 1000000000000L / 6L)))
    assert(got(("A", "C")) == ((1L, 3L, 1L, 1000000000000L / 3L)))
    assert(got(("B", "C")) == ((1L, 2L, 1L, 1000000000000L / 2L)))
    assert(got.size == 3)
  }

  test("minCooc filters, hub guard fails loudly") {
    val rows = Seq(("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "C"))
    val got = ItemCF.itemSimilarity(rows.toDF("u", "i"), col("u"), col("i"),
        minCooc = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("A", "B")))
    val hub = (0 until 40).map(i => ("hub", s"i$i"))
    intercept[IllegalArgumentException] {
      ItemCF.itemSimilarity(hub.toDF("u", "i"), col("u"), col("i"), 1L,
        maxItemsPerUser = 10L)
    }
  }
}
