package graft.operators

import graft.SparkSpec
import graft.functions.RollingHash

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1024

  /** Sequential reference: hashed-bucket censuses + two-ln log ratio. */
  private def refWeights(target: Seq[(Long, String)], raw: Seq[(Long, String)],
      docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def buckets(text: String): Seq[Long] =
      text.trim.toLowerCase.split("\\s+").toSeq
        .map(t => RollingHash.polyHash64(t.getBytes("UTF-8")) & (B - 1))
    val ct = target.flatMap(t => buckets(t._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val cr = raw.flatMap(t => buckets(t._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val nt = ct.values.sum; val nr = cr.values.sum
    docs.map { case (id, text) =>
      val bs = buckets(text)
      val w = bs.map { b =>
        math.round((math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + B).toDouble)
          - math.log((cr.getOrElse(b, 0L) + 1).toDouble / (nr + B).toDouble)) * 1e6)
      }.sum
      id -> ((bs.size.toLong, w))
    }.toMap
  }

  test("importance weights match the sequential reference; target-like docs rank first") {
    val target = Seq((1L, "alpha beta gamma alpha"), (2L, "beta gamma delta"))
    val off = Seq((3L, "omega psi chi phi"), (4L, "chi phi omega omega"))
    val raw = target ++ off
    val got = Dsir.importanceWeights(
        target.toDF("doc_id", "text"), raw.toDF("doc_id", "text"),
        raw.toDF("doc_id", "text"), "doc_id", "text", buckets = B)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val exp = refWeights(target, raw, raw)
    got.foreach { case (id, (n, w, _)) => assert((n, w) == exp(id), s"doc $id") }
    // ranks are the (w desc, id asc) total order
    val byRank = got.toSeq.sortBy(_._2._3).map(_._1)
    val expOrder = exp.toSeq.sortBy { case (id, (_, w)) => (-w, id) }.map(_._1)
    assert(byRank == expOrder)
    // every target doc outranks every off-domain doc
    val ranks = got.map { case (id, (_, _, r)) => id -> r }
    assert(Seq(1L, 2L).map(ranks).max < Seq(3L, 4L).map(ranks).min,
      "target-distribution docs must carry higher importance weights")
  }

  test("weights are partition-invariant and buckets must be a power of two") {
    val docs = (0L until 80L).map(i =>
      (i, s"t${i % 13} t${(i * 5) % 7} t${(i * 11) % 17}"))
    val target = docs.filter(_._1 % 3 == 0)
    def run(parts: Int) = Dsir.importanceWeights(
        target.toDF("doc_id", "text").repartition(parts),
        docs.toDF("doc_id", "text").repartition(parts),
        docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", buckets = 256)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(11))
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs.toDF("doc_id", "text"),
        docs.toDF("doc_id", "text"), docs.toDF("doc_id", "text"),
        "doc_id", "text", buckets = 1000)
    }
  }
}
