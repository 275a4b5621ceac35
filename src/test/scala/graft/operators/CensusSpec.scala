package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The census cardinality guard must be the identity under the bound and
  * FAIL LOUDLY (not sort the world on one reducer) past it. */
class CensusSpec extends SparkSpec {
  import spark.implicits._

  private def cumWithGuard(n: Int, maxRows: Long) = {
    val byV = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    (1 to n).map(i => (i.toLong, 1L)).toDF("v", "c")
      .withColumn("cum", Census.guardLong(sum(col("c")).over(byV),
        count(lit(1)).over(whole), "CensusSpec.test", maxRows))
  }

  test("guard is the arithmetic identity while the census is in bounds") {
    val got = cumWithGuard(100, maxRows = 100).select("v", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 100).forall(i => got(i.toLong) == i.toLong))
  }

  test("guard raises with an actionable message past the bound") {
    val e = intercept[Exception] {
      cumWithGuard(101, maxRows = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val all = messages(e).mkString("\n")
    assert(all.contains("CensusSpec.test") &&
      all.contains("bounded-domain contract"), s"unexpected: $all")
  }

  test("guarded operators stay green on contract-sized input") {
    // end-to-end: the real call sites still produce their exact outputs
    val surv = Seq((3L, true), (3L, false), (5L, true), (7L, true))
      .toDF("d", "o")
    val km = Survival.kaplanMeier(surv, col("d"), col("o"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(km == Map(3L -> 4L, 5L -> 2L, 7L -> 1L)) // n_risk per event t
    val mw = RankStats.mannWhitney(
      Seq((1L, true), (2L, true), (3L, false), (4L, false))
        .toDF("v", "s"), col("v"), col("s")).collect().head
    assert(mw.getAs[Long]("u1_x2") == 0L) // sample 1 strictly below
  }
}
