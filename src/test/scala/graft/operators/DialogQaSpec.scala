package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DialogQaSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    // session 1: u a a u a → one violation (a,a), longest run 2
    (1L, 1000L, "user", 1L), (1L, 2000L, "assistant", 2L),
    (1L, 3000L, "assistant", 3L), (1L, 4000L, "user", 4L),
    (1L, 9000L, "assistant", 5L),
    // session 2: a single turn
    (2L, 500L, "assistant", 6L))

  test("transcriptAudit: hand-computed session facts are exact") {
    val got = DialogQa.transcriptAudit(
        turns.toDF("sess", "ts", "r", "id"),
        col("sess"), col("ts"), col("r"), col("id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val s1 = got(1L)
    assert(s1.getLong(1) == 5L && s1.getLong(2) == 2L)
    assert(s1.getString(3) == "user" && s1.getString(4) == "assistant")
    assert(s1.getLong(5) == 1L)              // one a,a violation
    assert(s1.getLong(6) == 5000L)           // max gap 4000→9000
    assert(s1.getLong(7) == 8000L)           // total gaps 1000·3 + 5000
    assert(s1.getLong(8) == 2L)              // longest same-role run
    val s2 = got(2L)
    assert(s2.getLong(1) == 1L && s2.getLong(5) == 0L)
    assert(s2.isNullAt(6) && s2.getLong(7) == 0L && s2.getLong(8) == 1L)
  }

  test("equal timestamps break on the tie column, not arrival order") {
    // both orders of the same two equal-ts turns give the same audit
    val a = Seq((1L, 100L, "user", 1L), (1L, 100L, "assistant", 2L))
    val b = a.reverse
    def run(rows: Seq[(Long, Long, String, Long)]) =
      DialogQa.transcriptAudit(rows.toDF("s", "t", "r", "i"),
        col("s"), col("t"), col("r"), col("i"))
        .collect().map(_.toString).mkString
    assert(run(a) == run(b))
    assert(run(a).contains("user") && run(a).startsWith("[1,2,2,user"))
  }

  test("audit is invariant to partitioning") {
    val rows = (0 until 3000).map { i =>
      (i % 13L, (i * 37L) % 5000L,
        if ((i * 7919) % 3 == 0) "user" else "assistant", i.toLong)
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      DialogQa.transcriptAudit(df, col("s"), col("t"), col("r"), col("i"))
        .collect().map(_.toString).sorted.mkString("|")
    assert(run(rows.toDF("s", "t", "r", "i").repartition(1)) ==
      run(rows.reverse.toDF("s", "t", "r", "i").repartition(17)))
  }
}
