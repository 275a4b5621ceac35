package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DerivedJoinTableSpec extends SparkSpec {
  import spark.implicits._

  private def mkTables(root: String) = {
    val fact = new UpsertTable(s"$root/fact", Seq("fk_id"), "ver", Nil,
      Some("del"))
    val dim = new UpsertTable(s"$root/dim", Seq("d_id"), "ver", Nil,
      Some("del"))
    val view = new UpsertTable(s"$root/view", Seq("fk_id"), "__ver", Nil,
      Some("__dead"))
    val djt = new DerivedJoinTable(fact, dim, view, Seq("d_ref"),
      df => df.select(col("fk_id"), col("d_ref"), col("label"),
        col("amount")),
      s"$root/_ckpt")
    (fact, dim, view, djt)
  }

  private def facts(rows: (Long, Long, Long, Long, Boolean)*): DataFrame =
    rows.toDF("fk_id", "d_ref", "amount", "ver", "del")
  private def dims(rows: (Long, String, Long, Boolean)*): DataFrame =
    rows.toDF("d_id", "label", "ver", "del")

  private def viewState(view: UpsertTable): Set[(Long, Long, String, Long)] =
    view.snapshot(spark).select("fk_id", "d_ref", "label", "amount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  private def parity(view: UpsertTable, djt: DerivedJoinTable): Unit = {
    val full = djt.fullRecompute(spark)
      .select("fk_id", "d_ref", "label", "amount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(viewState(view) == full)
  }

  test("fact churn, dim churn, fk moves, and deletes all maintain the view") {
    val root = java.nio.file.Files.createTempDirectory("graft_djt").toString
    val (fact, dim, view, djt) = mkTables(root)
    dim.upsert(dims((1L, "a", 1L, false), (2L, "b", 1L, false),
      (3L, "c", 1L, false)))
    fact.upsert(facts((10L, 1L, 100L, 1L, false), (11L, 2L, 200L, 1L, false),
      (12L, 9L, 300L, 1L, false))) // 12 dangles: no dim 9
    djt.refresh(spark)
    assert(viewState(view) == Set((10L, 1L, "a", 100L), (11L, 2L, "b", 200L)))
    parity(view, djt)

    // fact-side: amount update, fk move onto the dangling-free dim 3,
    // delete fact 11; dim-side: relabel dim 1, delete dim 3.
    fact.upsert(facts((10L, 3L, 150L, 2L, false), (11L, 2L, 200L, 2L, true)))
    djt.refresh(spark)
    parity(view, djt)
    assert(viewState(view) == Set((10L, 3L, "c", 150L)))

    dim.upsert(dims((1L, "a2", 2L, false), (3L, "c", 2L, true)))
    djt.refresh(spark)
    parity(view, djt)
    // fact 10's dim died → tombstoned; 12 still dangling; 11 deleted.
    assert(viewState(view) == Set.empty)

    // resurrect: dim 9 appears → dangling fact 12 joins again.
    dim.upsert(dims((9L, "i", 3L, false)))
    djt.refresh(spark)
    parity(view, djt)
    assert(viewState(view) == Set((12L, 9L, "i", 300L)))
  }

  test("randomized op sequences keep view ≡ full recompute") {
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_djt_r$seed").toString
      val (fact, dim, view, djt) = mkTables(root)
      var ver = 0L
      // seed both sides (fullRecompute's snapshot contract needs ≥1
      // commit each; refresh itself no-ops until then — exercised by
      // refreshing after the fact-only seed)
      fact.upsert(facts((0L, 0L, 1L, 0L, false)))
      assert(djt.refresh(spark) == ((0L, 0L))) // dim empty: bootstrap no-op
      dim.upsert(dims((0L, "l0", 0L, false)))
      for (step <- 1 to 8) {
        ver += 1
        if (rnd.nextBoolean()) {
          val rows = (0 until 1 + rnd.nextInt(6)).map { _ =>
            (rnd.nextInt(20).toLong, rnd.nextInt(8).toLong,
              rnd.nextInt(1000).toLong, ver, rnd.nextInt(5) == 0)
          }.distinct.groupBy(_._1).map(_._2.head).toSeq // one row per key
          fact.upsert(facts(rows: _*))
        } else {
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            (rnd.nextInt(8).toLong, s"l${rnd.nextInt(9)}", ver,
              rnd.nextInt(5) == 0)
          }.distinct.groupBy(_._1).map(_._2.head).toSeq
          dim.upsert(dims(rows: _*))
        }
        if (rnd.nextInt(3) == 0 || step == 8) {
          djt.refresh(spark)
          parity(view, djt)
        }
      }
    }
  }

  test("refresh is a no-op without new commits and replays idempotently") {
    val root = java.nio.file.Files.createTempDirectory("graft_djt2").toString
    val (fact, dim, view, djt) = mkTables(root)
    dim.upsert(dims((1L, "a", 1L, false)))
    fact.upsert(facts((10L, 1L, 100L, 1L, false)))
    val ck1 = djt.refresh(spark)
    assert(djt.refresh(spark) == ck1) // no new commits: checkpoint stable
    parity(view, djt)
    assert(viewState(view) == Set((10L, 1L, "a", 100L)))
  }
}
