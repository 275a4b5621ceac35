package graft

import org.apache.spark.sql.functions._

import graft.agg.BoundedSample
import graft.operators.ExactQuantiles

class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(String, Long)], percents: Seq[Int]): Set[(String, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      percents.map { p =>
        val target = ((n * p + 99L) / 100L).toInt
        (g, p.toLong, sorted(target - 1))
      }
    }.toSet

  test("bounded sample is deterministic across partitionings and merges") {
    BoundedSample.register(spark)
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(10000)
      .select(col("id"), (col("id") * 7919 % 104729).as("v"))
      .withColumn("p", graft.functions.GraftFunctions
        .xxhash64Seed0(col("id").cast("string")))
    val s1 = df.repartition(1)
      .agg(BoundedSample.boundedSample(col("v"), col("p"), 64)).head.getSeq[Long](0)
    val s13 = df.repartition(13)
      .agg(BoundedSample.boundedSample(col("v"), col("p"), 64)).head.getSeq[Long](0)
    assert(s1 == s13)
    assert(s1.length == 64)
    assert(s1 == s1.sorted)
  }

  test("exact quantiles match brute force on a continuous-ish domain") {
    // values with many distinct levels + duplicates + skew
    val rows = (1 to 5000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = if (i % 10 == 0) 42L else (i.toLong * 2654435761L) % 1000003L
      (g, v)
    }
    val df = rows.toDF("g", "v").withColumn("k", monotonically_increasing_id())
    val got = ExactQuantiles.quantiles(df, Seq("g"), col("v"),
        concat(col("g"), col("v"), col("k")), Seq(10, 50, 90, 100))
      .as[(String, Long, Long)].collect().toSet
    assert(got == brute(rows, Seq(10, 50, 90, 100)))
  }

  test("maxGroups guard fails loudly on high-cardinality groupings") {
    val df = spark.range(500)
      .select(col("id").cast("string").as("g"), col("id").as("v"),
        col("id").as("k"))
    // 500 groups > maxGroups=100: the fetch is limit-bounded and the
    // require fires (instead of an unbounded driver collect)
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.quantiles(df, Seq("g"), col("v"), col("k"),
        Seq(50), maxGroups = 100)
    }
    assert(e.getMessage.contains("maxGroups"))
    // at exactly the cardinality bound the computation still runs
    val ok = ExactQuantiles.quantiles(df, Seq("g"), col("v"), col("k"),
      Seq(50), maxGroups = 500)
    assert(ok.count() == 500L)
  }

  test("tiny k exercises the bracket-retry path and stays exact") {
    val rows = (1 to 2000).map(i => ("g", (i.toLong * 48271) % 65537))
    val df = rows.toDF("g", "v").withColumn("k", monotonically_increasing_id())
    // k=4 gives a sample far too small to bracket reliably — the widen
    // loop must degrade to open bounds and still land the exact answer.
    val got = ExactQuantiles.quantiles(df, Seq("g"), col("v"),
        col("k"), Seq(1, 50, 99), k = 4)
      .as[(String, Long, Long)].collect().toSet
    assert(got == brute(rows, Seq(1, 50, 99)))
  }

  test("winsorize clips to the exact envelope, ties included") {
    val rows = (1 to 1000).map(i => ("g", (i.toLong * 48271) % 997))
    val df = rows.toDF("g", "v").withColumn("k", monotonically_increasing_id())
    val sorted = rows.map(_._2).sorted
    def q(p: Int) = sorted(((rows.length.toLong * p + 99) / 100).toInt - 1)
    val (lo, hi) = (q(10), q(90))
    val got = ExactQuantiles.winsorize(df, Seq("g"), col("v"), col("k"),
        10, 90, "w").select("v", "w").as[(Long, Long)].collect()
    assert(got.length == rows.length)
    got.foreach { case (v, w) =>
      assert(w == math.min(math.max(v, lo), hi), s"v=$v w=$w lo=$lo hi=$hi")
    }
  }

  test("single-row and all-equal groups") {
    val rows = Seq(("one", 7L), ("eq", 5L), ("eq", 5L), ("eq", 5L))
    val df = rows.toDF("g", "v").withColumn("k", monotonically_increasing_id())
    val got = ExactQuantiles.quantiles(df, Seq("g"), col("v"),
        col("k"), Seq(50, 100))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("one", 50L, 7L), ("one", 100L, 7L),
      ("eq", 50L, 5L), ("eq", 100L, 5L)))
  }

  test("trimmedStats drops outliers outside the exact [pLow, pHigh] fences") {
    // 1..100 per group: p5 fence = 5, p95 fence = 95 (value at rank
    // ceil(n·p/100)); kept = 5..95 inclusive → 91 values, sum = 4550
    val rows = (1L to 100L).map(v => ("g", v)) ++ Seq(("h", 7L), ("h", 1000L))
    val df = rows.toDF("grp", "v").withColumn("k", monotonically_increasing_id())
    val got = ExactQuantiles.trimmedStats(df, Seq("grp"), col("v"), col("k"),
        pLow = 5, pHigh = 95)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("g") == ((5L, 95L, 100L, 91L, (5L to 95L).sum)))
    // n=2: p5 fence = value at rank ceil(2*5/100)=1 → 7; p95 → rank
    // ceil(1.9)=2 → 1000; everything kept
    assert(got("h") == ((7L, 1000L, 2L, 2L, 1007L)))
  }

  test("equiDepthBins matches rank-derived buckets, ties collapse left") {
    val rnd = new scala.util.Random(11)
    // duplicates on purpose: values drawn from a small range force cut
    // ties, exercising the collapse-left rule
    val rows = (0L until 500L).map(i => (i, (rnd.nextInt(40) + 1).toLong))
    val df = rows.toDF("k", "v").repartition(9)
    for (buckets <- Seq(4, 10)) {
      val got = ExactQuantiles.equiDepthBins(df, col("v"), col("k"),
          buckets, "bucket")
        .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
      // model: cuts at value of rank ceil(n*b/B) in (v, k) order;
      // bucket = 1 + |cuts strictly below v|
      val sorted = rows.sortBy(r => (r._2, r._1)).map(_._2)
      val n = sorted.size
      val cuts = (1 until buckets)
        .map(b => sorted(((n.toLong * b * (100 / buckets) + 99) / 100).toInt - 1))
      val model = rows.map { case (k, v) => k -> (1 + cuts.count(_ < v)) }.toMap
      assert(got == model, s"buckets=$buckets")
      // depth balance: with heavy ties buckets can skew, but every bucket
      // boundary is still an exact rank cut — sizes sum to n
      assert(got.values.toSeq.distinct.forall(b => b >= 1 && b <= buckets))
    }
  }

  test("weightedHalfPoint: smallest cell where cumulative weight doubles past total") {
    import org.apache.spark.sql.functions.col
    // g: weights 1@10, 2@20, 3@30 (total 6; cum 1,3,6 → 2*3>=6 at x=20)
    // h: single cell
    val rows = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("h", 5L, 7L)).toDF("k", "x", "w")
    val got = ExactQuantiles.weightedHalfPoint(rows, Seq("k"), col("x"),
        col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("g") == ((3L, 6L, 20L)))
    assert(got("h") == ((1L, 7L, 5L)))
  }

  test("groupedHistogramPercentiles matches the global form per group") {
    import org.apache.spark.sql.functions.col
    val rows = (for (g <- Seq("a", "b"); i <- 1 to 100)
      yield (g, if (g == "a") i.toLong else i * 2L)).toDF("g", "v")
    val got = ExactQuantiles.groupedHistogramPercentiles(rows, Seq("g"),
        col("v"), Seq(50, 95))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got(("a", 50L)) == 50L && got(("a", 95L)) == 95L)
    assert(got(("b", 50L)) == 100L && got(("b", 95L)) == 190L)
  }
}
