package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish multiset with genuine churn: value "h<i>" appears 2^(9-i)
  // times for i in 0..9 (1023 heavy-ish rows), plus 4000 singletons.
  private def zipfRows: Seq[String] = {
    val heavy = (0 to 9).flatMap(i => Seq.fill(1 << (9 - i))(s"h$i"))
    val noise = (0 until 4000).map(i => s"s$i")
    heavy ++ noise
  }

  private def brute(rows: Seq[String], phiDen: Int): Map[String, Long] = {
    val n = rows.size.toLong
    val minCount = (n + phiDen - 1) / phiDen
    rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap
  }

  test("exact heavy hitters match brute force across partitionings and orders") {
    val rows = zipfRows
    for {
      data <- Seq(rows, rows.sorted, rows.reverse)
      parts <- Seq(1, 7, 32)
      phiDen <- Seq(50, 200)
    } {
      val df = data.toDF("v").repartition(parts)
      val got = MisraGries.heavyHitters(df, col("v"), phiDen, k = 2 * phiDen)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == brute(data, phiDen), s"parts=$parts phiDen=$phiDen")
    }
  }

  test("sketch guarantee: candidates cover every phi-heavy value, counts undercount-bounded") {
    val rows = zipfRows
    val n = rows.size.toLong
    val k = 64
    MisraGries.register(spark)
    val render = rows.toDF("v").repartition(13)
      .agg(MisraGries.misraGries(col("v"), k)).head().getString(0)
    val sketch = MisraGries.parse(render).toMap
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.filter { case (_, c) => c > n / (k + 1) }.foreach { case (v, _) =>
      assert(sketch.contains(v), s"phi-heavy $v evicted")
    }
    sketch.foreach { case (v, c) =>
      val t = truth(v)
      assert(c <= t && c > t - n.toDouble / (k + 1) - 1, s"$v: sketch=$c true=$t")
    }
    assert(sketch.size <= k)
  }

  test("values containing the render separators round-trip") {
    val weird = Seq.fill(40)("a\u001eb\u001fc") ++ Seq.fill(25)("p\u001ed") ++
      (0 until 30).map(i => s"x$i")
    val got = MisraGries.heavyHitters(weird.toDF("v"), col("v"), 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute(weird, 4))
  }

  test("nulls ignored; empty input yields empty output") {
    val withNulls = (Seq.fill(30)(Some("hot")) ++ Seq.fill(10)(Option.empty[String]) ++
      (0 until 20).map(i => Some(s"u$i"))).toDF("v")
    val got = MisraGries.heavyHitters(withNulls, col("v"), 3, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 50 non-null, minCount = ceil(50/3) = 17 -> only "hot" (30)
    assert(got == Map("hot" -> 30L))
    assert(MisraGries.heavyHitters(Seq.empty[String].toDF("v"), col("v"), 2, 4)
      .collect().isEmpty)
  }

  test("summary survives streaming state stores (guarantee, not render, is the contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    MisraGries.register(spark)
    val rows = zipfRows
    val mem = MemoryStream[String]
    val sdf = mem.toDS().toDF("v")
      .agg(MisraGries.misraGries(col("v"), 64).as("mg"))
    val q = sdf.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      // two batches: the buffer must serialize/merge across state commits
      mem.addData(rows.take(2000): _*); q.processAllAvailable()
      mem.addData(rows.drop(2000): _*); q.processAllAvailable()
    } finally q.stop()
    val sketch = MisraGries.parse(
      spark.table("mg_stream").collect().head.getString(0)).toMap
    // unlike HLL/CMS (order-invariant renders, exact streaming≡batch),
    // MG content is merge-order-dependent: the CONTRACT is completeness
    val n = rows.size.toLong
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.filter { case (_, c) => c > n / 65 }.foreach { case (v, _) =>
      assert(sketch.contains(v), s"phi-heavy $v lost in streaming merge")
    }
    assert(sketch.size <= 64)
    sketch.foreach { case (v, c) => assert(c <= truth(v)) }
  }

  test("k below phiDen is rejected loudly") {
    intercept[IllegalArgumentException] {
      MisraGries.heavyHitters(Seq("a").toDF("v"), col("v"), phiDen = 100, k = 50)
    }
  }

  test("verify pass filters spurious candidates at the exact threshold boundary") {
    // 10 values at count 9 (just under minCount=10), one at exactly 10:
    // sketch holds all (k large), exact pass must keep only the boundary one
    val rows = (0 until 10).flatMap(i => Seq.fill(9)(s"near$i")) ++
      Seq.fill(10)("edge")
    val got = MisraGries.heavyHitters(rows.toDF("v"), col("v"), 10, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("edge" -> 10L))
  }

  test("merge agg of stored slice summaries keeps phi-heavy candidates of the union") {
    // two slices with DIFFERENT hot values plus churn; the merged summary
    // must still contain every value that is heavy in the UNION, per the
    // ACHPW mergeability bound
    MisraGries.register(spark)
    val k = 16
    val slice1 = Seq.fill(60)("a") ++ (0 until 100).map(i => s"x$i")
    val slice2 = Seq.fill(70)("b") ++ (100 until 200).map(i => s"x$i")
    val sliced = (slice1.map(("s1", _)) ++ slice2.map(("s2", _)))
      .toDF("slice", "v").repartition(7)
    val perSlice = sliced.groupBy(col("slice"))
      .agg(MisraGries.misraGries(col("v"), k).as("mg"))
    val merged = perSlice.agg(MisraGries.misraGriesMerge(col("mg"), k))
      .head().getString(0)
    val sketch = MisraGries.parse(merged).toMap
    val union = slice1 ++ slice2
    val n = union.size.toLong
    val truth = union.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.filter { case (_, c) => c > n / (k + 1) }.foreach { case (v, _) =>
      assert(sketch.contains(v), s"union-heavy $v evicted from merge")
    }
    // undercount bound holds through the two-level merge tree
    sketch.foreach { case (v, c) =>
      assert(c <= truth(v), s"$v overcounted: $c > ${truth(v)}")
    }
    assert(sketch.size <= k)
  }

  test("sliding heavy hitters match per-window brute force") {
    // 8 hourly slices; "h" is heavy in every hour, "m" only in hours 4-5,
    // singletons churn everywhere. Windows of 3 slices, phi = 1/4.
    val sliceMs = 3600000L
    val rows: Seq[(String, Long)] = (0 until 8).flatMap { h =>
      val base = h * sliceMs + 17L
      Seq.fill(10)(("h", base)) ++
        (if (h == 4 || h == 5) Seq.fill(12)(("m", base + 5)) else Nil) ++
        (0 until 20).map(i => (s"u$h-$i", base + i))
    }
    val df = rows.toDF("value", "ts").repartition(9)
    val got = MisraGries.slidingHeavyHitters(df, col("value"), col("ts"),
        sliceMs, slicesPerWindow = 3, phiDen = 4, k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute force: every window start on the slice grid covered by data
    val brute = (for {
      w <- (-2 until 8).map(_ * sliceMs)
      inWin = rows.filter { case (_, t) =>
        val slice = t - t % sliceMs
        slice >= w && slice < w + 3 * sliceMs
      }
      if inWin.nonEmpty
      n = inWin.size.toLong
      minC = (n + 3) / 4
      (v, c) <- inWin.groupBy(_._1).view.mapValues(_.size.toLong)
      if c >= minC
    } yield (w, v) -> c).toMap
    assert(got == brute)
  }
}
