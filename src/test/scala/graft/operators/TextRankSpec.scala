package graft.operators

import graft.SparkSpec

/** BM25 must match a sequential reference computed with the same pinned
  * operation order, rank rare-term matches above common-term matches, and
  * be invariant to partitioning (the long-sum discipline). */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join join join"),
    (2L, "spark spark spark filter scan"),
    (3L, "join elephant"),
    (4L, "scan scan scan scan scan scan scan scan"),
    (5L, "nothing relevant here at all"))

  private val terms = Seq("join", "elephant")

  private def reference: Map[Long, (Long, Long)] = {
    val tok = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val dl = tok.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val nDocs = docs.size.toLong
    val sumDl = dl.values.sum
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val tf = tok.flatMap { case (id, ts) =>
      terms.flatMap { t =>
        val c = ts.count(_ == t).toLong
        if (c > 0) Some((id, t, c)) else None
      }
    }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    tf.groupBy(_._1).map { case (id, xs) =>
      val score = xs.map { case (_, t, c) =>
        val norm = (1.0 - 0.75) + 0.75 * (dl(id).toDouble / avgdl)
        val idf = math.log(1.0 + ((nDocs - df(t)) + 0.5) / (df(t) + 0.5))
        math.round(idf * ((c.toDouble * (1.2 + 1.0)) / (c.toDouble + 1.2 * norm)) * 1000000.0)
      }.sum
      id -> (xs.size.toLong, score)
    }
  }

  test("scores match the sequential reference; ranking is deterministic") {
    val out = TextRank.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = reference
    assert(out.length == ref.size)
    out.foreach { case (id, matched, score, _) =>
      assert(ref(id) == ((matched, score)), s"doc $id diverges")
    }
    // doc 3 holds the only 'elephant' (df=1, high idf) → outranks the
    // common-term docs despite a single occurrence of each term.
    val rankOf = out.map(r => r._1 -> r._4).toMap
    assert(rankOf(3L) == 1L, s"rare-term doc not first: $rankOf")
    // ranks are a 1..n permutation, tie-broken by id
    assert(out.map(_._4).sorted.toSeq == (1L to out.length).toSeq)
  }

  test("bm25 plans with NO window operator (single-reducer global rank trap)") {
    val plan = TextRank.bm25(docs.toDF("doc_id", "text"), "doc_id", "text",
        terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("long-sum scores are partition-invariant") {
    val df = docs.toDF("doc_id", "text")
    val a = TextRank.bm25(df.repartition(1), "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    val b = TextRank.bm25(df.repartition(7), "doc_id", "text", terms)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("ppmiWindow: negative PMI clamps to 0, equal-structure pairs tie") {
    // "a b" ×1, "a c" ×9, "d b" ×9: unigrams a=10 b=10 c=9 d=9 (n1=38),
    // pairs (a,b)=1 (a,c)=9 (d,b)=9 (n2=19).
    // PMI(a,b) = ln(0.76) < 0 → clamped; PMI(a,c) = PMI(d,b)
    //          = ln(7.6)·1e6 → 2028148.
    val corpus = (Seq.fill(1)("a b") ++ Seq.fill(9)("a c") ++
      Seq.fill(9)("d b")).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = TextRank.ppmiWindow(corpus.toDF("doc_id", "text"),
        "doc_id", "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5)))
    assert(got.toSeq == Seq(("a", "c", 9L, 2028148L),
      ("d", "b", 9L, 2028148L), ("a", "b", 1L, 0L)), s"got ${got.toSeq}")
  }

  test("ppmiWindow plans with NO window operator (pairs built in-array)") {
    val plan = TextRank.ppmiWindow(Seq((1L, "p q r")).toDF("doc_id", "text"),
        "doc_id", "text", minCount = 1L, topK = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(800))
  }

  test("ppmiWindow: offset-2 contexts pair across one gap") {
    // "p q r": pairs (p,q) (q,r) at offset 1, (p,r) at offset 2;
    // every pair PMI = ln(3)·1e6 = 1098612.
    val got = TextRank.ppmiWindow(Seq((1L, "p q r")).toDF("doc_id", "text"),
        "doc_id", "text", minCount = 1L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(got.length == 3 && got.forall(_._3 == 1098612L), s"got ${got.toSeq}")
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set(("p", "q"), ("q", "r"), ("p", "r")))
  }

  test("tfDfKeywords: stopwords sink, distinctive repeats rise, ties break on term") {
    val kdocs = Seq(
      (1L, "the the the zebra zebra the quark"),
      (2L, "the the apple apple apple banana"),
      (3L, "the banana banana cherry")
    ).toDF("doc_id", "text")
    val got = TextRank.tfDfKeywords(kdocs, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // doc 1: zebra tf=2 df=1 -> 2e6 tops; "the" tf=4 df=3 -> 1333333
    // outranks quark 1/1 -> 1e6 (pure tf/df has no log dampening)
    assert(got((1L, 1L)) == (("zebra", 2L, 1L, 2000000L)))
    assert(got((1L, 2L)) == (("the", 4L, 3L, 1333333L)))
    // doc 2: apple 3/1 -> 3e6 beats banana 1/2 -> 500000 and the 2/3
    assert(got((2L, 1L))._1 == "apple")
    // doc 3: banana 2/2 -> 1e6 tops; cherry 1/1 -> 1e6 ties, term asc
    assert(got((3L, 1L))._1 == "banana")
    assert(got((3L, 2L))._1 == "cherry")
  }

  test("tfidfCosinePairs: shared-term dots, df prune, exact integers") {
    // "x y" appears in docs 1,2 (df=2); "zzz" everywhere (df=4 > maxDf=3
    // → pruned); "solo" hapax (df=1 → pruned)
    val docs = Seq(
      (1L, "x y zzz"), (2L, "x y zzz"), (3L, "x solo zzz"), (4L, "q zzz"))
      .toDF("doc_id", "text")
    val got = TextRank.tfidfCosinePairs(docs, "doc_id", "text",
        maxDf = 3L, minCosE6 = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // surviving terms: x (df=3, w=333), y (df=2, w=500)
    // doc1=doc2={x:333,y:500}; doc3={x:333}; doc4={} (drops entirely)
    val n12 = 333L * 333 + 500L * 500
    assert(got((1L, 2L)) == ((n12, n12, n12, 1000000L)))
    val dot13 = 333L * 333
    val cos13 = math.round(dot13.toDouble /
      math.sqrt(n12.toDouble * dot13.toDouble) * 1e6)
    assert(got((1L, 3L)) == ((dot13, n12, dot13, cos13)))
    assert(got((2L, 3L)) == ((dot13, n12, dot13, cos13)))
    assert(got.size == 3)
  }
}
