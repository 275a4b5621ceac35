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
}
