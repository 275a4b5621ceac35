package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // pinned mirror of the operator's per-cell chain + MW rounds
  private def mirror(cells: Map[(String, String), Long], rounds: Int,
      etaE6: Long): Map[String, (Long, Long, Long, Long, Long)] = {
    val ng = cells.groupBy(_._1._1).view
      .mapValues(m => m.values.sum).toMap
    val nv = cells.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cc = cells.groupBy(_._1._2).view
      .mapValues(m => m.values.sum).toMap
    val n = cc.values.sum
    def pin(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val excess = cells.toSeq.groupBy(_._1._1).view.mapValues { cs =>
      val kl = cs.map { case ((d, v), c) =>
        val p = c.toDouble / ng(d)
        val q = cc(v).toDouble / n
        pin(p * math.log(p / q) * 1e6)
      }.sum
      math.max(0L, kl)
    }.toMap
    val ds = ng.keys.toSeq.sorted
    var w: Map[String, BigInt] =
      ds.map(_ -> BigInt(1000000L / ds.size)).toMap
    for (_ <- 1 to rounds) {
      val wp = ds.map(d => d ->
        (w(d) * (1000000 + (etaE6 * excess(d)) / 1000000) / 1000000)).toMap
      val tw = wp.values.sum
      w = ds.map(d => d -> (wp(d) * 1000000 / tw)).toMap
    }
    ds.map(d => d -> ((nv(d), ng(d),
      (BigInt(ng(d)) * 1000000 / n).toLong, excess(d),
      w(d).toLong))).toMap
  }

  test("doremi weights match the exact-integer mirror") {
    // skewed corpus: domain A common words, B niche (high KL), C mixed
    val docs = Seq(
      ("A", "the cat sat on the mat"),
      ("A", "the dog sat on the log"),
      ("B", "quantum flux entangles qubits"),
      ("B", "quantum decoherence limits qubits"),
      ("C", "the quantum cat"),
      ("C", "the mat on the log"))
    val df = docs.toDF("source", "text")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("v"))
    val got = Mixture.doremiWeightsE6(df, col("source"), col("v"),
        rounds = 3, etaE6 = 500000L)
      .select("domain", "n_values", "n_tokens", "share_e6", "excess_e6",
        "w_e6")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val cells = docs
      .flatMap { case (d, t) => t.split("\\s+").map(v => (d, v)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = mirror(cells, rounds = 3, etaE6 = 500000L)
    assert(got == exp, s"got $got\nexp $exp")
  }

  test("weights boost the high-excess domain and sum to ~1e6") {
    val docs = Seq(
      ("common", "a b c d a b c d a b"),
      ("common", "a b c d a b c d c d"),
      ("alien", "x y z w x y z w x y"))
    val df = docs.toDF("source", "text")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("v"))
    val out = Mixture.doremiWeightsE6(df, col("source"), col("v"),
        rounds = 3, etaE6 = 500000L)
      .select("domain", "excess_e6", "w_e6")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out("alien")._1 > out("common")._1, "alien domain has higher KL")
    assert(out("alien")._2 > out("common")._2, "MW must boost it")
    val total = out.values.map(_._2).sum
    assert(total >= 999998L && total <= 1000000L,
      s"weights must normalize (truncating): $total")
  }

  test("data-grain domain column is rejected loudly") {
    val df = spark.range(200001)
      .selectExpr("CAST(id AS STRING) AS d", "'w' AS v")
    val e = intercept[IllegalArgumentException] {
      Mixture.doremiWeightsE6(df, col("d"), col("v"), 1, 500000L).count()
    }
    assert(e.getMessage.contains("domain-grain"))
  }

  // sequential waterfill mirror of unimaxAllocationE6's pinned rules
  private def waterfill(counts: Map[String, Long], budget: Long,
      epochsE6: Long): Map[String, Long] = {
    val caps = counts.toSeq
      .map { case (d, n) => (d, BigInt(n) * epochsE6 / 1000000) }
      .sortBy { case (d, c) => (c, d) }
    val n = caps.size
    var s = BigInt(0)
    var k = 0
    var sk = BigInt(0)
    for (((_, c), i) <- caps.zipWithIndex.map { case (p, i) => (p, i + 1) }) {
      s += c
      if (s + c * (n - i) <= budget) { k = i; sk = s }
    }
    val r = BigInt(budget) - sk
    caps.zipWithIndex.map { case ((d, c), i0) =>
      val i = i0 + 1
      d -> (if (i <= k) c.toLong
            else (r / (n - k) +
              (if (BigInt(i - k) <= r % (n - k)) 1 else 0)).toLong)
    }.toMap
  }

  test("unimax allocation matches the waterfill mirror (mixed branch)") {
    // caps at 2 epochs: a=20, b=40, c=200, d=400; budget 300:
    // a and b cap (20+40), rest split 240: 120 each (< their caps)
    val counts = Map("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 200L)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      Seq.fill(n.toInt)(d) }
    val out = Mixture.unimaxAllocationE6(rows.toDF("d"), col("d"),
        budget = 300L, maxEpochsE6 = 2000000L)
      .select("domain", "n_tokens", "cap_tokens", "alloc_tokens",
        "epochs_e6", "budget_share_e6")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val exp = waterfill(counts, 300L, 2000000L)
    assert(out.view.mapValues(_._4).toMap == exp)
    assert(out("a")._4 == 20L && out("b")._4 == 40L)
    assert(out("c")._4 == 120L && out("d")._4 == 120L)
    assert(out("c")._5 == 1200000L, "c runs 1.2 epochs")
    assert(out("a")._6 == 20L * 1000000L / 300L)
  }

  test("unimax: remainder tokens go to the first uncapped domains " +
      "in (cap, domain) order") {
    // no domain caps (big epoch cap); budget 10 over 3 domains:
    // base 3, remainder 1 -> the lowest-(cap, domain) gets 4
    val counts = Map("x" -> 5L, "y" -> 5L, "z" -> 7L)
    val rows = counts.toSeq.flatMap { case (d, n) => Seq.fill(n.toInt)(d) }
    val out = Mixture.unimaxAllocationE6(rows.toDF("d"), col("d"),
        budget = 10L, maxEpochsE6 = 5000000L)
      .select("domain", "alloc_tokens")
      .as[(String, Long)].collect().toMap
    assert(out == waterfill(counts, 10L, 5000000L))
    assert(out == Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
  }

  test("unimax: budget beyond every cap leaves the surplus unallocated") {
    val counts = Map("p" -> 3L, "q" -> 4L)
    val rows = counts.toSeq.flatMap { case (d, n) => Seq.fill(n.toInt)(d) }
    val out = Mixture.unimaxAllocationE6(rows.toDF("d"), col("d"),
        budget = 1000L, maxEpochsE6 = 2000000L)
      .select("domain", "cap_tokens", "alloc_tokens")
      .as[(String, Long, Long)].collect()
      .map { case (d, c, a) => d -> ((c, a)) }.toMap
    assert(out("p") == ((6L, 6L)) && out("q") == ((8L, 8L)))
  }

  test("unimax: data-grain domain column is rejected loudly") {
    val df = spark.range(200001).selectExpr("CAST(id AS STRING) AS d")
    val e = intercept[IllegalArgumentException] {
      Mixture.unimaxAllocationE6(df, col("d"), 100L, 2000000L).count()
    }
    assert(e.getMessage.contains("domain-grain"))
  }
}
