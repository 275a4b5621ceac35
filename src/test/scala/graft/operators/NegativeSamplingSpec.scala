package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  private def draw(user: Long, slot: Long, nItems: Long): Long =
    ((48271L * (((user % P) * 65537L + slot + 1L) % P)) % P) % nItems

  test("draws replay the Lehmer closed form and skip interactions") {
    // user 7's first candidate is excluded by an interaction; the
    // sampler must fill from later slots
    val firstItem = draw(7L, 0L, 10L)
    val inter = Seq((7L, firstItem)).toDF("u", "it")
    val got = NegativeSampling.negativeSample(inter, col("u"), col("it"),
        nItems = 10L, k = 3, oversample = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(got.length == 3)
    assert(!got.map(_._1).contains(firstItem))
    // every kept row is the formula's value at its slot
    got.foreach { case (item, slot) => assert(item == draw(7L, slot, 10L)) }
    // distinct items, slots ascending with collisions skipped
    assert(got.map(_._1).distinct.length == 3)
  }

  test("collisions keep the lowest slot; at most k distinct per user") {
    // tiny item space forces collisions
    val inter = Seq((1L, -1L)).toDF("u", "it") // nothing excluded
    val got = NegativeSampling.negativeSample(inter, col("u"), col("it"),
        nItems = 3L, k = 2, oversample = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length <= 2)
    assert(got.map(_._1).distinct.length == got.length)
    got.foreach { case (item, slot) =>
      // no earlier slot draws the same item
      (0L until slot).foreach(s0 =>
        assert(draw(1L, s0, 3L) != item || s0 == slot))
    }
  }

  test("output is invariant to input partitioning") {
    val inter = (1 to 200).map(i => ((i % 20).toLong, (i % 7).toLong))
    val one = NegativeSampling.negativeSample(
        inter.toDF("u", "it").repartition(1), col("u"), col("it"),
        50L, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val many = NegativeSampling.negativeSample(
        inter.reverse.toDF("u", "it").repartition(13), col("u"), col("it"),
        50L, 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == many && one.nonEmpty)
  }
}
