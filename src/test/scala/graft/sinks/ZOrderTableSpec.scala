package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: reads must be exact under any predicate rectangle, and
  * the manifest must prune buckets on EVERY indexed dimension — the
  * property a single-column sort layout cannot provide. */
class ZOrderTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir = Files.createTempDirectory("zorder").toString

  test("interleave produces the textbook Morton pattern") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrderTable.interleave(Seq(col("x"), col("y")), 4).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit i of x lands at 2i, bit i of y at 2i+1
    assert(z((0L, 0L)) == 0L)
    assert(z((1L, 0L)) == 1L)
    assert(z((0L, 1L)) == 2L)
    assert(z((1L, 1L)) == 3L)
    assert(z((2L, 3L)) == (4L | 2L | 8L)) // x=10b → bit1@2; y=11b → bits@1,3
  }

  test("read returns exactly the full-scan filter result") {
    val dir = freshDir
    val df = spark.range(5000).select(
      (col("id") * 7919 % 1000).as("u"),
      (col("id") * 104729 % 100000).as("t"),
      col("id").as("payload"))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 64)
    val preds = Map("u" -> (100L, 199L), "t" -> (20000L, 39999L))
    val got = ZOrderTable.read(spark, dir, preds)
      .select("u", "t", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = df.where(col("u").between(100, 199) && col("t").between(20000, 39999))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("a rectangle narrow in EITHER dimension prunes buckets") {
    val dir = freshDir
    // u and t each genuinely span their domain, decorrelated by a Knuth
    // multiplicative hash — every (u, t) cell is populated
    val df = spark.range(20000).select(
      (col("id") % 512).as("u"),
      (col("id") * 2654435761L % 4096).as("t"),
      col("id").as("payload"))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 64)
    val total = spark.read.parquet(s"$dir/_zmanifest").count()
    assert(total > 32, s"degenerate layout: $total buckets")
    val narrowU = ZOrderTable.selectBuckets(spark, dir,
      Map("u" -> (0L, 31L))).size // 1/16 of the u domain
    val narrowT = ZOrderTable.selectBuckets(spark, dir,
      Map("t" -> (0L, 255L))).size // 1/16 of the t domain
    // z-interleaving keeps BOTH dimensions skippable — a u-sorted layout
    // would scan every file for the t-only predicate and vice versa
    assert(narrowU <= total / 4, s"u-narrow read $narrowU/$total buckets")
    assert(narrowT <= total / 4, s"t-narrow read $narrowT/$total buckets")
  }

  test("bucket filter lands in the scan's partition filters (directory pruning)") {
    val dir = freshDir
    val df = spark.range(2000).select((col("id") % 100).as("u"),
      (col("id") % 997).as("t"), col("id").as("payload"))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 16)
    val plan = ZOrderTable.read(spark, dir, Map("u" -> (0L, 9L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zbucket"),
      plan.take(1500))
  }

  test("empty input writes an empty, readable table instead of an NPE") {
    val dir = freshDir
    val df = spark.range(10).select(col("id").as("u"), col("id").as("t"))
      .where(lit(false))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 4)
    assert(ZOrderTable.read(spark, dir, Map("u" -> (0L, 100L))).count() == 0)
  }

  test("bloom manifest prunes point lookups min/max cannot") {
    val dir = freshDir
    // secondary key `sk` is scattered: every bucket's [min,max] covers
    // nearly the full sk domain, so min/max pruning is useless for it —
    // exactly the case the bloom column exists for.
    val df = spark.range(4096).select(
      col("id").as("u"), col("id").as("t"),
      (col("id") * 2654435761L % 4093L).as("sk"))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 16,
      bloomCols = Seq("sk"))
    val probe = 5L * 2654435761L % 4093L // sk of id=5 — present
    val kept = ZOrderTable.selectBucketsEq(spark, dir, Map.empty,
      Map("sk" -> probe))
    assert(kept.nonEmpty && kept.size < 16,
      s"bloom pruned nothing: kept ${kept.size}/16")
    val rows = ZOrderTable.readEq(spark, dir, Map.empty, Map("sk" -> probe))
      .select("u").collect().map(_.getLong(0)).toSet
    val expected = (0L until 4096L).filter(i => i * 2654435761L % 4093L == probe).toSet
    assert(rows == expected, "bloom-pruned read lost or invented rows")
    // absent key: nothing survives the probe (no false negatives needed)
    val missing = ZOrderTable.readEq(spark, dir, Map.empty, Map("sk" -> 4094L))
    assert(missing.count() == 0)
    // combined with a range pred on a z column
    val combined = ZOrderTable.readEq(spark, dir,
      Map("u" -> (0L, 2047L)), Map("sk" -> probe))
      .select("u").collect().map(_.getLong(0)).toSet
    assert(combined == expected.filter(_ <= 2047L))
  }

  test("degenerate shapes: constant column, empty predicate result, one bucket") {
    val dir = freshDir
    val df = spark.range(100).select(lit(7L).as("u"), col("id").as("t"))
    ZOrderTable.write(df, dir, Seq("u", "t"), buckets = 4)
    // constant column quantizes to 0; everything still readable
    val all = ZOrderTable.read(spark, dir, Map("u" -> (0L, 100L)))
    assert(all.count() == 100)
    // a predicate missing every bucket reads nothing
    val none = ZOrderTable.read(spark, dir, Map("t" -> (1000L, 2000L)))
    assert(none.count() == 0)
  }
}
