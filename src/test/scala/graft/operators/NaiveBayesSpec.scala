package graft.operators

import graft.SparkSpec

/** The held-out NB confusion must match a sequential model doing the
  * identical per-term e6-rounded log arithmetic, drop OOV tokens, and
  * stay partition-invariant (integer score sums commute). */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // even ids train, odd ids score; "zzz" appears only in test (OOV)
  private val docs = Seq(
    (0L, "apple banana apple", "fruit"),
    (2L, "banana apple fruit basket", "fruit"),
    (4L, "carrot potato onion", "veg"),
    (6L, "potato carrot soup", "veg"),
    (1L, "apple banana", "fruit"),
    (3L, "carrot potato zzz", "veg"),
    (5L, "apple potato", "fruit"))

  private def model(): Map[(String, String), Long] = {
    val train = docs.filter(_._1 % 2 == 0)
    val counts = train.flatMap { case (_, t, l) =>
      t.split("\\s+").filter(_.nonEmpty).map(tok => (l, tok)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vocab = counts.keys.map(_._2).toSet
    val langs = train.map(_._3).distinct.sorted
    val tots = langs.map(l =>
      l -> counts.collect { case ((`l`, _), c) => c }.sum).toMap
    val v = vocab.size.toLong
    def term(l: String, tok: String): Long =
      math.round((math.log(counts.getOrElse((l, tok), 0L) + 1.0) -
        math.log(tots(l) + v.toDouble)) * 1e6)
    val nd = train.groupBy(_._3).map { case (l, d) => l -> d.size.toLong }
    val ntot = train.size.toLong
    def prior(l: String): Long =
      math.round((math.log(nd(l).toDouble) - math.log(ntot.toDouble)) * 1e6)
    docs.filter(_._1 % 2 == 1).flatMap { case (_, t, actual) =>
      val toks = t.split("\\s+").filter(tok => tok.nonEmpty && vocab(tok))
      if (toks.isEmpty) None
      else {
        val scored = langs.map(l =>
          l -> (prior(l) + toks.map(term(l, _)).sum))
        val pred = scored.minBy { case (l, s) => (-s, l) }._1
        Some((actual, pred))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  test("held-out confusion matches the sequential e6-integer model") {
    for (parts <- Seq(1, 5)) {
      val df = docs.toDF("doc_id", "text", "lang").repartition(parts)
      val got = NaiveBayes.heldOutConfusion(df, "doc_id", "text", "lang")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == model(), s"parts=$parts got $got want ${model()}")
    }
  }

  test("sanity: clean vocabularies classify correctly, OOV is ignored") {
    val m = model()
    // doc 1 (pure fruit words) and doc 3 (veg + OOV zzz) both land right
    assert(m.getOrElse(("fruit", "fruit"), 0L) >= 1L)
    assert(m.getOrElse(("veg", "veg"), 0L) >= 1L)
  }
}
