package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-prep operators: split stability, packing arithmetic, PII
  * scrubbing, decontamination, histogram quantiles — semantics plus the
  * plan shapes that matter at scale. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup drops template lines, keeps order, preserves blanks") {
    val boiler = "subscribe to our newsletter"
    val docs = ((1L to 10L).map(i =>
      (i, s"$boiler\nunique line $i\n\nsecond unique $i")) :+
      (99L, s"$boiler\n$boiler")) // fully-boilerplate doc
      .toDF("doc_id", "text")
    val out = CorpusOps.lineDedup(docs, "doc_id", "text", maxDocFreq = 5L)
      .as[(Long, String)].collect().toMap
    // the 11-doc boilerplate line is gone; unique lines survive in order,
    // the empty line survives as structure
    assert(out(1L) == "unique line 1\n\nsecond unique 1")
    assert(out.size == 10 && !out.contains(99L)) // fully-templated doc drops
    // below-threshold repetition survives
    val mild = ((1L to 3L).map(i => (i, s"shared header\nbody $i")))
      .toDF("doc_id", "text")
    val kept = CorpusOps.lineDedup(mild, "doc_id", "text", maxDocFreq = 5L)
      .as[(Long, String)].collect().toMap
    assert(kept(2L) == "shared header\nbody 2")
  }

  test("exactSubstringDedup cuts duplicated spans, keeps canonical, unions overlaps") {
    // k=3: "x1 x2 x3" duplicates between docs 1 and 2; doc 1 (lower id)
    // keeps it, doc 2 loses exactly those three tokens. Doc 3 repeats the
    // span INTERNALLY at two positions — the first keeps, the second cuts.
    // Doc 4 has no duplicated window and passes through verbatim.
    val docs = Seq(
      (1L, "x1 x2 x3 tail1"),
      (2L, "head2 x1 x2 x3 tail2"),
      (3L, "x9 x8 x7 mid x9 x8 x7"),
      (4L, "only unique words here"))
      .toDF("doc_id", "text")
    val out = CorpusOps.exactSubstringDedup(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "x1 x2 x3 tail1")
    assert(out(2L) == "head2 tail2")
    assert(out(3L) == "x9 x8 x7 mid")
    assert(out(4L) == "only unique words here")
    // overlap union: doc 6 contains doc 5's "a b c d" shifted — windows
    // (a b c) and (b c d) both duplicate; their spans union to all of
    // "a b c d", never double-cut or leave a seam token behind
    val ov = Seq((5L, "a b c d"), (6L, "z a b c d"))
      .toDF("doc_id", "text")
    val got = CorpusOps.exactSubstringDedup(ov, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(got(5L) == "a b c d" && got(6L) == "z")
    // a doc that loses every token drops entirely
    val full = Seq((7L, "p q r"), (8L, "p q r")).toDF("doc_id", "text")
    val kept = CorpusOps.exactSubstringDedup(full, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(kept == Map(7L -> "p q r"))
    // docs shorter than k contribute no windows and pass through
    val tiny = Seq((9L, "a b"), (10L, "a b")).toDF("doc_id", "text")
    assert(CorpusOps.exactSubstringDedup(tiny, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap ==
      Map(9L -> "a b", 10L -> "a b"))
  }

  test("stratifiedSplit hits exact per-stratum proportions, deterministically") {
    val df = (0 until 1000).map(i => (i.toLong, "s" + i % 7)).toDF("id", "g")
    val weights = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)
    def run() = CorpusOps.stratifiedSplit(df, "id", "g", weights)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val a = run()
    assert(a.toSet == run().toSet) // deterministic
    // exact integer proportions per stratum: |train| = floor(8n/10), etc.
    a.groupBy(_._2).foreach { case (g, rows) =>
      val n = rows.size
      val counts = rows.groupBy(_._3).view.mapValues(_.size).toMap
      val train = 8 * n / 10
      val valC = 9 * n / 10 - train
      assert(counts.getOrElse("train", 0) == train, s"$g train")
      assert(counts.getOrElse("val", 0) == valC, s"$g val")
      assert(counts.getOrElse("test", 0) == n - train - valC, s"$g test")
    }
    // rank order is the hash order: recompute the reference assignment
    val ref = a.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(t =>
        (graft.functions.RollingHash.polyHash64(t._1.toString.getBytes("UTF-8")), t._1))
      val n = sorted.size
      sorted.zipWithIndex.map { case (t, i) =>
        val rn = i + 1L
        val s = if (rn * 10 <= 8L * n) "train"
          else if (rn * 10 <= 9L * n) "val" else "test"
        (t._1, t._2, s)
      }
    }.toSet
    assert(a.toSet == ref)
  }

  test("splitAssign is deterministic and stable under corpus growth") {
    val small = (1L to 200L).toDF("id")
    val big = (1L to 400L).toDF("id")
    def splits(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.splitAssign(df, "id", "#s1")
        .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    val a = splits(small); val b = splits(big)
    // documents keep their split when the corpus doubles
    assert(a.forall { case (id, sp) => b(id) == sp })
    assert(b.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(b.values.count(_ == "train") > b.values.count(_ == "val"))
    // different salt reshuffles membership (new epoch, new split)
    val c = CorpusOps.splitAssign(small, "id", "#s2")
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(a.exists { case (id, sp) => c(id) != sp })
  }

  test("splitAssign plan has no exchange (embarrassingly parallel)") {
    val plan = CorpusOps.splitAssign((1L to 10L).toDF("id"), "id", "#s1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("packSequences cuts the per-shard token stream at the budget") {
    val docs = Seq(
      (1L, "a", 300L), (2L, "a", 300L), (3L, "a", 300L), // shard a: 900 toks
      (4L, "b", 600L), (5L, "b", 100L))                  // shard b: 700 toks
      .toDF("id", "shard", "nt")
    val out = CorpusOps.packSequences(docs, "id", "shard", col("nt"), 512L)
      .select(col("id"), col("chunk_id"), col("chunk_off"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0L)))   // starts at offset 0
    assert(out(2L) == ((0L, 300L))) // still chunk 0
    assert(out(3L) == ((1L, 88L)))  // 600 % 512
    assert(out(4L) == ((0L, 0L)))   // shard b independent
    assert(out(5L) == ((1L, 88L)))  // 600 % 512 in shard b
  }

  test("piiScrub counts and redacts emails, urls, phones; negatives untouched") {
    val docs = Seq(
      (1L, "mail me at a.b+c@ex-ample.org today"),
      (2L, "docs at https://ex.org/a?q=1 and http://b.io"),
      (3L, "call +1 555 867 5309 now"),
      (4L, "no pii here, just text @ nothing")) // bare @ is not an email
      .toDF("id", "text")
    val out = CorpusOps.piiScrub(docs, col("text"))
      .select(col("id"), col("n_emails"), col("n_urls"), col("n_phones"),
        col("redacted"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(out(2L) == ((0L, 2L, 0L, "docs at <URL> and <URL>")))
    assert(out(3L) == ((0L, 0L, 1L, "call <PHONE> now")))
    assert(out(4L) == ((0L, 0L, 0L, "no pii here, just text @ nothing")))
  }

  test("contamination finds shared n-grams and broadcasts the held-out side") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a totally different sentence here"),
      (3L, "THE QUICK BROWN dog runs")) // case-folded match
      .toDF("id", "text")
    val test = Seq((100L, "the quick brown fox"), (101L, "quick brown fox wins"))
      .toDF("id", "text")
    val out = CorpusOps.contamination(train, test, "id", "text", 3)
    val got = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1 shares: "the quick brown"(100), "quick brown fox"(100,101),
    // "brown fox jumps"(neither) → 2 grams, 2 test docs
    assert(got(1L) == ((2L, 2L)))
    assert(got(3L) == ((1L, 1L))) // "the quick brown" via lowercasing
    assert(!got.contains(2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("mixtureSample keeps a stable hash-gated subset near the target rate") {
    val df = (1L to 2000L).toDF("id")
    val kept = CorpusOps.mixtureSample(df, "id", "#m1",
      lit(CorpusOps.pctHexBound(25))).as[Long].collect().toSet
    // binomial(2000, ~0.25): expect well within ±5 points
    assert(kept.size > 400 && kept.size < 600, kept.size)
    // deterministic: same salt → same set; rate bump only ADDS documents
    val again = CorpusOps.mixtureSample(df, "id", "#m1",
      lit(CorpusOps.pctHexBound(25))).as[Long].collect().toSet
    assert(again == kept)
    val more = CorpusOps.mixtureSample(df, "id", "#m1",
      lit(CorpusOps.pctHexBound(50))).as[Long].collect().toSet
    assert(kept.subsetOf(more))
    // 100% keeps everything, 0% keeps nothing
    assert(CorpusOps.mixtureSample(df, "id", "#m1",
      lit(CorpusOps.pctHexBound(100))).count() == 2000L)
    assert(CorpusOps.mixtureSample(df, "id", "#m1",
      lit(CorpusOps.pctHexBound(0))).count() == 0L)
  }

  test("wordNgrams drops docs shorter than n") {
    val out = CorpusOps.wordNgrams(
      Seq((1L, "just two"), (2L, "one two three")).toDF("id", "text"),
      "id", "text", 3)
    assert(out.as[(Long, String)].collect().toSet ==
      Set((2L, "one two three")))
  }

  test("chunkTokens: stride grid + tail alignment, full coverage, no shuffle") {
    // 10 tokens, window 4, stride 3 → grid starts 1, 4, 7 plus tail 7
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = CorpusOps.chunkTokens(docs, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(got((1L, 1L)) == ((4L, "t1 t2 t3 t4")))
    assert(got((1L, 4L)) == ((4L, "t4 t5 t6 t7")))
    assert(got((1L, 7L)) == ((4L, "t7 t8 t9 t10")))
    // short docs: exactly one chunk at start 1, runt width
    assert(got((2L, 1L)) == ((2L, "a b")))
    assert(got((3L, 1L)) == ((1L, "solo")))
    assert(got.size == 5)

    // tail NOT on the grid: 9 tokens, window 4, stride 3 → 1, 4 grid + 6 tail
    val nine = Seq((9L, (1 to 9).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tails = CorpusOps.chunkTokens(nine, "doc_id", "text", 4, 3)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(tails == Seq(1L, 4L, 6L))

    // narrow plan: no exchange anywhere
    val plan = CorpusOps.chunkTokens(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("temperatureWeights: α<1 upweights small sources, quotas never overspend") {
    val df = (Seq.fill(800)("big") ++ Seq.fill(100)("mid") ++ Seq.fill(8)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = CorpusOps.temperatureWeights(df, "source", alpha = 0.5, budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // sequential reference
    val ns = Map("big" -> 800L, "mid" -> 100L, "tiny" -> 8L)
    val us = ns.map { case (k, n) => k -> math.round(math.pow(n.toDouble, 0.5) * 1e6) }
    val tot = us.values.sum
    ns.keys.foreach { k =>
      val share = us(k) * 1000000L / tot
      assert(got(k) == ((ns(k), share, share * 1000L / 1000000L)), k)
    }
    // the temperature effect: tiny's share exceeds its raw proportion
    assert(got("tiny")._2 > 8L * 1000000L / 908L)
    assert(got.values.map(_._3).sum <= 1000L, "quotas must not overspend")
  }

  test("discQuantiles returns the exact rank-ceil(p*n/100) values per group") {
    // group g: values 1..10 → p50 = rank 5 = 5, p90 = rank 9 = 9,
    // p99 = rank ceil(9.9)=10 → 10; duplicates collapse into the histogram
    val df = ((1 to 10).map(v => ("g", v.toLong)) ++
      Seq(("h", 7L), ("h", 7L), ("h", 9L))).toDF("grp", "v")
    val out = CorpusOps.discQuantiles(df, "grp", "v", Seq(50, 90, 99))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("g") == ((10L, 5L, 9L, 10L)))
    // h: n=3, p50 → rank 2 = 7, p90/p99 → rank 3 = 9
    assert(out("h") == ((3L, 7L, 9L, 9L)))
  }

  test("cdcChunks: content-defined boundaries survive an insertion (the CDC property)") {
    // find a token whose PolyHash64 is ≡ 0 mod 4 to use as a boundary
    val boundaryTok = (1 to 1000).map(i => s"tok$i").find { t =>
      graft.functions.RollingHash.polyHash64(t.getBytes("UTF-8")) % 4 == 0
    }.get
    val tail = s"alpha beta $boundaryTok gamma delta epsilon"
    val docs = Seq(
      (1L, tail),
      (2L, s"INSERTED PREFIX WORDS $boundaryTok $tail") // prefix added
    ).toDF("doc_id", "text")
    val chunks = CorpusOps.cdcChunks(docs, "doc_id", "text", boundaryMod = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = chunks.groupBy(_._1)
    // doc 2's final chunk must fingerprint identically to doc 1's final
    // chunk: the boundary isolates the shared tail from the edit
    val fp1 = byDoc(1L).maxBy(_._2)
    val fp2 = byDoc(2L).maxBy(_._2)
    assert(fp1._4 == fp2._4, s"shared tail must share a fingerprint: $chunks")
    assert(fp1._3 == fp2._3, "and the same token count")
    // token counts per doc are preserved across chunks
    assert(byDoc(1L).map(_._3).sum == 6L)
    assert(byDoc(2L).map(_._3).sum == 10L)
  }

  test("frequencySpectrum: N_c census over raw tokens, case-folded") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "A b c d"),
      (3L, "e")
    ).toDF("doc_id", "text")
    // counts: a=4 (case-folded), b=3, c=2, d=1, e=1
    val got = CorpusOps.frequencySpectrum(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(4L -> 1L, 3L -> 1L, 2L -> 1L, 1L -> 2L))
  }

  test("apportion: quotas sum EXACTLY to the budget, largest remainders win") {
    // weights 1,1,1 / budget 10: base 3 each, deficit 1 → tie on
    // remainder broken by key order: 'a' gets the extra unit
    val df = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "w")
    val got = CorpusOps.apportion(df, "k", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(got == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))

    // hand case: weights 5,3,2 / budget 7 → exact 3.5,2.1,1.4; bases
    // 3,2,1 (sum 6), remainders .5,.1,.4 → 'a' takes the leftover
    val df2 = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w")
    val got2 = CorpusOps.apportion(df2, "k", "w", 7L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(got2 == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))

    // fuzz: many weights, prime budget — sums exactly, every quota within
    // 1 of the real-valued share (the Hamilton quota property)
    val big = (1 to 97).map(i => (s"k$i", (i * 31 % 17 + 1).toLong))
      .toDF("k", "w")
    val rows = CorpusOps.apportion(big, "k", "w", 99991L).collect()
    val tot = rows.map(_.getAs[Long]("quota")).sum
    assert(tot == 99991L)
    val wSum = (1 to 97).map(i => i * 31 % 17 + 1).sum.toDouble
    rows.foreach { r =>
      val exact = 99991L * r.getAs[Long]("weight") / wSum
      val q = r.getAs[Long]("quota")
      assert(q >= math.floor(exact) && q <= math.ceil(exact),
        s"${r.getString(0)}: $q vs $exact")
    }
  }

  test("neymanAllocation: exact isqrt weights, variance-heavy strata earn more") {
    // stratum a: constant values → S=0 → weight 0;
    // stratum b: 4 values {0,0,10,10}: N·Σy²−(Σy)² = 4·200−400=400 → w=20
    // stratum c: same size, wilder {0,0,0,100}: 4·10000−10000=30000 →
    //   isqrt = 173 (173²=29929 ≤ 30000 < 174²=30276) — perfect-square
    //   correction path exercised
    val df = Seq.fill(4)(("a", 5L)) ++
      Seq(("b", 0L), ("b", 0L), ("b", 10L), ("b", 10L)) ++
      Seq(("c", 0L), ("c", 0L), ("c", 0L), ("c", 100L))
    val got = CorpusOps.neymanAllocation(df.toDF("g", "v"), "g", "v", 193L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("weight"), r.getAs[Long]("quota")))).toMap
    assert(got("a")._1 == 0L)
    assert(got("b")._1 == 20L)
    assert(got("c")._1 == 173L)
    assert(got.values.map(_._2).sum == 193L)
    // 193·20/193 = 20 exactly; 193·173/193 = 173 exactly
    assert(got("b")._2 == 20L && got("c")._2 == 173L && got("a")._2 == 0L)
  }

  test("vocabGrowth counts each word's first bucket once; curve is cumulative") {
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"),      // bucket 0: tokens 5, vocab {a,b,c}
      (2L, "c d"),                     // bucket 1: +d
      (4L, "a b c d"))                 // bucket 2: nothing new
      .toDF("doc_id", "text")
    val got = CorpusOps.vocabGrowth(docs, "doc_id", "text", 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      0L -> ((5L, 3L, 5L, 3L)),
      1L -> ((2L, 1L, 7L, 4L)),
      2L -> ((4L, 0L, 11L, 4L))))
  }

  test("weightedDiscQuantiles: mass, not row count, places the cut") {
    val df = Seq(("g", 1L, 30L), ("g", 2L, 30L), ("g", 3L, 40L),
      ("g", 4L, 0L), ("g", 5L, -7L)) // non-positive weights carry nothing
      .toDF("grp", "v", "w")
    val r = CorpusOps.weightedDiscQuantiles(df, "grp", "v", "w",
      Seq(25, 50, 75, 95)).collect().head
    assert(r.getLong(1) == 100L)              // total_weight
    assert(r.getLong(2) == 1L)                // p25: cum 30 ≥ 25
    assert(r.getLong(3) == 2L)                // p50: cum 60 ≥ 50
    assert(r.getLong(4) == 3L)                // p75: needs the 40 at 3
    assert(r.getLong(5) == 3L)                // p95
  }

  test("effectiveSampleSize: uniform weights give ESS = n; collapse shows") {
    val df = Seq(("u", 5L), ("u", 5L), ("u", 5L), ("u", 5L),
      ("k", 97L), ("k", 1L), ("k", 1L), ("k", 1L))
      .toDF("grp", "w")
    val got = CorpusOps.effectiveSampleSize(df, "grp", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(4)))
      .toMap
    assert(got("u") == (4L, 4000000L))   // uniform → exactly n
    // collapsed: (100)²·1e6 div (9409+3) = 1e10 div 9412 = 1062473
    assert(got("k") == (4L, 1062473L))   // worth ~1.06 samples, not 4
  }

  test("zipfSlopeE6: three-point head matches the BigInt OLS mirror") {
    import org.apache.spark.sql.functions.col
    // counts a:4 b:2 c:1 → ranks 1,2,3; mirror the pinned e6 chain
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val r = CorpusOps.zipfSlopeE6(docs, "doc_id", "text", topK = 10)
      .collect().head
    val xs = Seq(1L, 2L, 3L).map(v => math.round(math.log(v.toDouble) * 1e6))
    val ys = Seq(4L, 2L, 1L).map(v => math.round(math.log(v.toDouble) * 1e6))
    val n = BigInt(3)
    val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
    val sxx = xs.map(x => BigInt(x) * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val slope = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    val icept = (sy * 1000000 - slope * sx) / 1000000 / n
    assert(r.getLong(0) == 3L)
    assert(r.getLong(3) == slope.toLong && r.getLong(4) == icept.toLong)
    assert(slope < -1100000L && slope > -1400000L) // near-Zipf head
    // a single-word corpus has one rank → no fit
    val solo = CorpusOps.zipfSlopeE6(
      Seq((1L, "x x x")).toDF("doc_id", "text"), "doc_id", "text", 10)
      .collect().head
    assert(solo.isNullAt(3) && solo.isNullAt(4))
  }

  test("oovRate: min-count floor shapes the vocab; token vs type rates") {
    import org.apache.spark.sql.functions.col
    // train: "a b a" + "c a" → vocab (count ≥ 2) = {a} only
    val train = Seq((1L, "a b a"), (2L, "c a")).toDF("doc_id", "text")
    // eval g1: "a b d d" → 4 tokens, 3 types; OOV tokens {b, d, d} = 3,
    // OOV types {b, d} = 2
    val eval = Seq(("g1", "a b d d")).toDF("source", "text")
    val r = CorpusOps.oovRate(train, eval, "text", "source", minCount = 2L)
      .collect().head
    assert(r.getString(0) == "g1")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 3L, 3L, 2L)))
    assert(r.getLong(5) == 750000L && r.getLong(6) == 666666L)
    // an in-vocab-only group reads 0 / 0
    val clean = CorpusOps.oovRate(train,
      Seq(("g2", "a a")).toDF("source", "text"), "text", "source", 2L)
      .collect().head
    assert(clean.getLong(3) == 0L && clean.getLong(5) == 0L)
  }
}
