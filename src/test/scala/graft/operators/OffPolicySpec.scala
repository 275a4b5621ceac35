package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OffPolicySpec extends SparkSpec {
  import spark.implicits._

  test("replayIps: per-segment argmax policy, replay + IPS counts") {
    // seg A train: x mean 10 vs y mean 2 → choose x;
    // eval: (x,5) (y,100) (x,7) → matched 2, sum 12, ips 24/3
    val rows = Seq(("A", "x", 10L, true), ("A", "x", 10L, true),
      ("A", "y", 2L, true), ("A", "x", 5L, false),
      ("A", "y", 100L, false), ("A", "x", 7L, false))
    val r = OffPolicy.replayIps(rows.toDF("seg", "arm", "r", "tr"),
      col("seg"), col("arm"), col("r"), col("tr"), nArms = 2)
      .collect().head
    assert(r.getAs[String]("chosen_arm") == "x")
    assert(r.getAs[Long]("n_eval") == 3L)
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Long]("sum_matched") == 12L)
    assert(r.getAs[Long]("ips_num") == 24L)
    assert(r.getAs[Long]("ips_den") == 3L)
  }

  test("replayIps: exact mean tie goes to the lexicographically first arm") {
    val rows = Seq(("A", "b", 6L, true), ("A", "a", 6L, true),
      ("A", "b", 1L, false))
    val r = OffPolicy.replayIps(rows.toDF("seg", "arm", "r", "tr"),
      col("seg"), col("arm"), col("r"), col("tr"), nArms = 2)
      .collect().head
    assert(r.getAs[String]("chosen_arm") == "a")
    assert(r.getAs[Long]("n_matched") == 0L)
  }

  test("snipsDr: hand-computed single-segment estimates are exact") {
    // train: A r=100, B r=10 → policy A, q(A)=1e8, q(B)=1e7 (e6 cents)
    // eval: (A, r=50, p=5e5) matched; (B, r=20, p=2.5e5) unmatched
    val rows = Seq(
      (0L, "A", 100L, 500000L, true), (0L, "B", 10L, 500000L, true),
      (0L, "A", 50L, 500000L, false), (0L, "B", 20L, 250000L, false))
      .toDF("seg", "arm", "r", "p", "tr")
    val got = OffPolicy.snipsDr(rows, col("seg"), col("arm"), col("r"),
      col("p"), col("tr")).collect().head
    assert(got.getLong(0) == 0L && got.getString(1) == "A")
    assert(got.getLong(2) == 2L && got.getLong(3) == 1L
      && got.getLong(4) == 0L)                       // eval/matched/miss
    assert(BigDecimal(got.getDecimal(5)).toLongExact == 100000000L) // sn
    assert(BigDecimal(got.getDecimal(6)).toLongExact == 2000000L)   // sd
    assert(got.getLong(7) == 50000000L)              // SNIPS = 50 cents
    // DR rows: matched A → 1e8 + (5e7−1e8)·1e6 div 5e5 = 0; B → 1e8
    assert(BigDecimal(got.getDecimal(8)).toLongExact == 100000000L)
    assert(got.getLong(9) == 50000000L)
  }

  test("snipsDr: arms unseen in training back off to 0 and are counted") {
    val rows = Seq(
      (0L, "A", 100L, 500000L, true),
      (0L, "C", 30L, 500000L, false))
      .toDF("seg", "arm", "r", "p", "tr")
    val got = OffPolicy.snipsDr(rows, col("seg"), col("arm"), col("r"),
      col("p"), col("tr")).collect().head
    assert(got.getLong(4) == 1L)        // n_train_miss
    assert(got.isNullAt(7))             // no matched rows → SNIPS NULL
  }
}
