package graft.operators

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK counts hits per query, keeps silent-miss queries") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("qid", "cid")
    val cand = Seq((1L, 11L), (1L, 99L), (3L, 30L)).toDF("qid", "cid")
    val got = RankEval.recallAtK(truth, cand, "qid", "cid")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 1L, 333333L)))
    assert(got(2L) == ((2L, 0L, 0L)))   // candidate side dropped q2 entirely
    assert(got.size == 2)               // q3 is not a truth query
  }

  test("ndcgWeightsE9 matches the closed form") {
    assert(RankEval.ndcgWeightsE9(3) ==
      Seq(1000000000L, 630929754L, 500000000L))
  }

  test("rankMetrics: MRR and NDCG against the literal discount table") {
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("qid", "cid")
    // q1: hits at ranks 2 and 3; q2: no hits
    val ranked = Seq((1L, 11L, 2), (1L, 12L, 3), (1L, 99L, 1), (2L, 98L, 1))
      .toDF("qid", "cid", "rank")
    val got = RankEval.rankMetrics(truth, ranked, "qid", "cid", "rank", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val w = RankEval.ndcgWeightsE9(3)
    val dcg1 = w(1) + w(2)
    val ideal1 = w.sum
    assert(got(1L) == ((3L, 2L, 500000L, dcg1, ideal1,
      dcg1 * 1000000L / ideal1)))
    // no hit: rank 0 sentinel, rr 0, dcg 0, ideal = top-1 weight
    assert(got(2L) == ((1L, 0L, 0L, 0L, w(0), 0L)))
  }

  test("rrfFuse: integer reciprocal-rank sums, total-ordered fusion") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val got = RankEval.rrfFuse(Seq(a, b), "id", "rank", kConst = 60L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val w = (r: Long) => 1000000L / (60L + r)
    // 11 fuses both sources and tops; 10 (rank 1) beats 13 (rank 2)
    assert(got(11L) == ((2L, w(2) + w(1), 1L)))
    assert(got(10L) == ((1L, w(1), 2L)))
    assert(got(13L) == ((1L, w(2), 3L)))
    assert(got(12L) == ((1L, w(3), 4L)))
  }

  test("rboTailWeightsE6: per-depth truncation then tail sums") {
    // k=3, p=9/10: per-depth 1e6, 9e6/20=450000, 81e6/300=270000
    assert(RankEval.rboTailWeightsE6(3) == Seq(1720000L, 720000L, 270000L))
    intercept[IllegalArgumentException](RankEval.rboTailWeightsE6(15))
  }

  test("rboMinE6: identical lists score (1-p^k)-ish max, disjoint score 0") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)).toDF("q", "id", "rank")
    // query 1: same ids, ranks 1/2 swapped; query 2: fully disjoint
    val b = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 12L, 3L),
      (2L, 30L, 1L), (2L, 31L, 2L), (2L, 32L, 3L)).toDF("q", "id", "rank")
    val got = RankEval.rboMinE6(a, b, "q", "id", "rank", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // q1: ids 10, 11 agree only from depth 2 (W(2) each); 12 from depth 3
    assert(got(1L) == ((3L, (720000L + 720000L + 270000L) / 10L)))
    assert(got(2L) == ((0L, 0L)))
    // perfect agreement = the RBO_min@3 ceiling: (W(1)+W(2)+W(3)) div 10
    val perfect = RankEval.rboMinE6(a, a, "q", "id", "rank", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(perfect(1L) == (1720000L + 720000L + 270000L) / 10L)
    assert(perfect(1L) == perfect(2L))
  }
}
