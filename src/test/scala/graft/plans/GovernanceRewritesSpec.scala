package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GovernanceRewritesSpec extends SparkSpec {
  import spark.implicits._

  private def withRules[T](maskFlag: Boolean = true,
      bcFlag: Boolean = true)(body: => T): T = {
    Seq(MaskingRewrite, StatsBroadcastRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
    spark.conf.set(MaskingRewrite.flagKey, maskFlag.toString)
    spark.conf.set(StatsBroadcastRewrite.flagKey, bcFlag.toString)
    try body finally {
      spark.conf.unset(MaskingRewrite.flagKey)
      spark.conf.unset(StatsBroadcastRewrite.flagKey)
    }
  }

  private lazy val (pplPath, refPath) = {
    val root = java.nio.file.Files.createTempDirectory("gov_rw").toString
    Seq((1L, Some("alice anderson"), 30), (2L, Some("bob brown"), 40),
      (3L, Option.empty[String], 50))
      .toDF("id", "name", "age")
      .write.mode("overwrite").parquet(s"$root/people.parquet")
    Seq((1L, "x"), (2L, "y"), (3L, "z"))
      .toDF("rid", "tag")
      .write.mode("overwrite").parquet(s"$root/refs.parquet")
    (s"$root/people.parquet", s"$root/refs.parquet")
  }

  private lazy val ppl = spark.read.parquet(pplPath)
  private lazy val refs = spark.read.parquet(refPath)

  test("masking rewrites values at the scan for every consumer") {
    MaskingRegistry.declareMask("/people.parquet", "name", "partial")
    withRules() {
      val got = ppl.select(col("id"), col("name"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got(1L) == Some("al***") && got(2L) == Some("bo***"))
      assert(got(3L).isEmpty) // NULL stays NULL
      // a filter sees the MASKED value — the raw string can't leak
      assert(ppl.where(col("name") === "alice anderson").count() == 0L)
      assert(ppl.where(col("name") === "al***").count() == 1L)
      // non-string column untouched
      assert(ppl.agg(sum(col("age"))).collect().head.getLong(0) == 120L)
    }
  }

  test("sha256 masking tokenizes deterministically — joins still match") {
    MaskingRegistry.clear()
    MaskingRegistry.declareMask("/people.parquet", "name", "sha256")
    withRules() {
      val a = ppl.select(col("name").as("n1"))
      val b = ppl.select(col("name").as("n2"))
      // masked self-join on the token matches exactly the non-null rows
      assert(a.join(b, col("n1") === col("n2")).count() == 2L)
      val v = ppl.where(col("id") === 1L).select(col("name"))
        .collect().head.getString(0)
      assert(v == java.security.MessageDigest.getInstance("SHA-256")
        .digest("alice anderson".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    }
  }

  test("masking kill switch restores raw values") {
    MaskingRegistry.declareMask("/people.parquet", "name", "partial")
    withRules(maskFlag = false) {
      assert(ppl.where(col("name") === "alice anderson").count() == 1L)
    }
  }

  // string-based so the check sees through the AQE wrapper (house
  // style — BucketedTableSpec does the same for Exchange pinning)
  private def joinPlan(df: DataFrame): (Boolean, Boolean) = {
    val s = df.queryExecution.executedPlan.toString
    (s.contains("BroadcastHashJoin"),
      s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"))
  }

  test("declared row counts flip a join to broadcast") {
    StatsBroadcastRewrite.clearCounts()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withRules() {
      val base = ppl.join(refs, col("id") === col("rid"))
      assert(joinPlan(base) == ((false, true)), "without declaration: SMJ")
      StatsBroadcastRewrite.declareRowCount("/refs.parquet", 3L)
      val hinted = ppl.join(refs, col("id") === col("rid"))
      assert(joinPlan(hinted) == ((true, false)),
        "declared-small side broadcasts")
      assert(hinted.count() == 3L)
      // kill switch
      spark.conf.set(StatsBroadcastRewrite.flagKey, "false")
      val off = ppl.join(refs, col("id") === col("rid"))
      assert(joinPlan(off) == ((false, true)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      StatsBroadcastRewrite.clearCounts()
      MaskingRegistry.clear()
    }
  }

  test("a declared-small LEFT side is not hinted where Spark can't build it") {
    StatsBroadcastRewrite.clearCounts()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withRules() {
      StatsBroadcastRewrite.declareRowCount("/refs.parquet", 3L)
      // refs on the LEFT of a LEFT OUTER join: only build-right is
      // legal there, so the declared-small left must stay un-hinted
      val q = refs.join(ppl, col("rid") === col("id"), "left")
      assert(joinPlan(q) == ((false, true)),
        q.queryExecution.executedPlan.toString)
      // the same declared table on the RIGHT of an inner join broadcasts
      val ok = ppl.join(refs, col("id") === col("rid"))
      assert(joinPlan(ok) == ((true, false)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      StatsBroadcastRewrite.clearCounts()
    }
  }
}
