package graft.operators

import graft.SparkSpec

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential pool-adjacent-violators reference: exact rational blocks,
    * then e6 truncation of each bin's block mean. */
  private def pavRef(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    case class Block(s: BigInt, c: BigInt, members: List[Long])
    var stack = List.empty[Block]
    bins.sortBy(_._1).foreach { case (b, s, c) =>
      var top = Block(BigInt(s), BigInt(c), List(b))
      // pool while the previous block's mean exceeds (violates) this one
      while (stack.nonEmpty && stack.head.s * top.c >= top.s * stack.head.c) {
        val prev = stack.head
        // strict violation OR equality — pooling equals is harmless
        if (prev.s * top.c > top.s * prev.c ||
          prev.s * top.c == top.s * prev.c) {
          top = Block(prev.s + top.s, prev.c + top.c,
            prev.members ++ top.members)
          stack = stack.tail
        }
      }
      stack = top :: stack
    }
    stack.flatMap(b => b.members.map(_ ->
      ((b.s * 1000000) / b.c).toLong)).toMap
  }

  private def fit(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val df = bins.map { case (b, s, c) => ("g", b, s, c) }
      .toDF("grp", "bin", "s", "c")
    Isotonic.isotonicFit(df, Seq("grp"), "bin", "s", "c")
      .collect().map(r => r.getAs[Long]("bin") ->
        r.getAs[Long]("fitted_e6")).toMap
  }

  test("already-monotone input is returned unchanged") {
    val bins = Seq((0L, 1L, 10L), (1L, 3L, 10L), (2L, 7L, 10L))
    assert(fit(bins) == Map(0L -> 100000L, 1L -> 300000L, 2L -> 700000L))
  }

  test("a single violator pools with its neighbor (hand case)") {
    // rates 0.5, 0.2 → pooled to 7/20 = 0.35 for both; then 0.8 stands
    val bins = Seq((0L, 5L, 10L), (1L, 2L, 10L), (2L, 8L, 10L))
    assert(fit(bins) == Map(0L -> 350000L, 1L -> 350000L, 2L -> 800000L))
  }

  test("minimax closed form equals sequential PAV on randomized inputs") {
    val rng = new scala.util.Random(42)
    (1 to 10).foreach { trial =>
      val bins = (0L until 12L).map(b =>
        (b, rng.nextInt(50).toLong, rng.nextInt(40).toLong + 1L))
      assert(fit(bins) == pavRef(bins), s"trial $trial: $bins")
    }
  }

  test("the fitted curve is always non-decreasing") {
    val rng = new scala.util.Random(7)
    val bins = (0L until 15L).map(b =>
      (b, rng.nextInt(100).toLong, rng.nextInt(30).toLong + 1L))
    val f = fit(bins).toSeq.sortBy(_._1).map(_._2)
    assert(f == f.sorted, f.toString)
  }
}
