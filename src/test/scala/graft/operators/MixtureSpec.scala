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
}
