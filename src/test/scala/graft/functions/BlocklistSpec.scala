package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: count every occurrence of every pattern,
    * overlaps included, by brute-force position scan. */
  private def refCounts(text: String, pats: Seq[String]): (Long, Long) = {
    val per = pats.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    }
    (per.sum, per.count(_ > 0).toLong)
  }

  private val pats = Seq("scan", "can", "an", "row", "merge")

  test("hits/terms match brute force incl. overlapping + nested matches") {
    Blocklist.register(spark)
    val texts = Seq(
      "scan the rows and merge",   // 'scan' contains 'can' contains 'an'
      "anana banana",              // overlapping 'an' runs
      "no matches here!!",         // wait: 'here' has no pattern... but 'an'? no
      "mergemerge scanscan",
      "",
      "a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), col("t"),
        Blocklist.blocklistHits(col("t"), pats).as("hits"),
        Blocklist.blocklistTerms(col("t"), pats).as("terms"))
    val got = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refCounts(t, pats), s"text '$t'")
    }
    // the dictionary-suffix chain really fires: one 'scan' = 3 hits
    assert(refCounts("scan", pats) == ((3L, 3L)))
  }

  test("randomized cross-check against brute force") {
    Blocklist.register(spark)
    val rnd = new scala.util.Random(7)
    val alphabet = "scanmergerow "
    val texts = (0 until 200).map { i =>
      (i.toLong, (0 until 40).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = texts.toDF("id", "t")
      .select(col("id"),
        Blocklist.blocklistHits(col("t"), pats).as("h"),
        Blocklist.blocklistTerms(col("t"), pats).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == refCounts(t, pats), s"text '$t'")
    }
  }

  /** Sequential entropy reference mirroring the expression's exact
    * double pipeline. */
  private def refEntropy(t: String): Long = {
    val bytes = t.getBytes("UTF-8")
    if (bytes.isEmpty) return 0L
    val n = bytes.length
    bytes.groupBy(identity).values.map { g =>
      val c = g.length
      math.round(c * (math.log(n.toDouble) - math.log(c.toDouble)) * 1e6 / n)
    }.sum
  }

  test("char entropy: constant text 0, uniform text ln(k), matches reference") {
    CharEntropyFn.register(spark)
    val texts = Seq("aaaaaaaa", "abcdabcd", "the quick brown fox", "", "x")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), CharEntropyFn.charEntropy(col("t")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refEntropy(t), s"text '$t'")
    }
    assert(got(0L) == 0L, "constant text has zero entropy")
    // 4 equiprobable symbols → ln 4 ≈ 1.386294 nats (±1 micro-nat
    // rounding per symbol term)
    assert(math.abs(got(1L) - 1386294L) <= 4L)
    assert(got(3L) == 0L, "empty text")
  }

  test("stays inside whole-stage codegen") {
    Blocklist.register(spark)
    // non-foldable input (a literal row folds to LocalTableScan at plan
    // time and proves nothing about the generated path)
    val df = spark.range(10)
      .select(concat(lit("scan"), col("id").cast("string")).as("t"))
      .select(Blocklist.blocklistHits(col("t"), pats).as("h"),
        Blocklist.blocklistTerms(col("t"), pats).as("n"))
    // the '*(n)' star marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("blocklist_hits"), plan)
    assert(df.collect().forall(r => r.getLong(0) == 3L && r.getLong(1) == 3L))
  }
}
