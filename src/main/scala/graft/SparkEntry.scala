package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.agg.ContentMetrics

/** Driver contract: the operator catalog (SURVEY.md §2 batch analogues +
  * LLM-pipeline extensions), each entry paired with an ANSI-SQL oracle that
  * DuckDB executes over the same parquet tables.
  *
  * The catalog itself lives in per-family registries under
  * [[graft.catalog]] (round-14 split — SparkEntry.scala had grown to
  * 19k LoC, ~40% of the repo, one compile unit and one place for
  * cache-key bugs to hide); this object only assembles the
  * driver-contract maps and rejects duplicate gate ids.
  *
  * Output conventions (chosen for bit-exact cross-engine comparison and for
  * partition-order independence at scale):
  *  - timestamps are epoch-millis BIGINT (`*_ms`), the reference's own
  *    data-plane convention (SURVEY §1.3);
  *  - money is integer cents/e4/e6 fixed-point BIGINT (the reference uses
  *    amount_micros longs) — integer sums are associative, double sums are
  *    not;
  *  - ratio thresholds are decided in integer arithmetic;
  *  - every ranking has a total order (explicit unique-id tie-breaks).
  */
object SparkEntry {

  /** Flagship: hourly content-metrics rollup (SURVEY A9+A11 analogue). */
  def entry(spark: SparkSession): DataFrame =
    ContentMetrics.hourly(Tables.load(spark, "/root/testdata/sf0.001", "events"))

  /** Reclaim per-query temp roots (upsert-table scenarios and the like) —
    * harnesses call this after consuming each result. Delegates to the
    * catalog-shared implementation. */
  def cleanupQueryTmp(): Unit = catalog.GateSupport.cleanupQueryTmp()

  private val families: Seq[catalog.GateFamily] = Seq(
    catalog.CoreGates,
    catalog.TableGates,
    catalog.MachineryGates,
    catalog.DedupGates,
    catalog.SimilarityGates,
    catalog.TextGates,
    catalog.TokenizerGates,
    catalog.SketchGates,
    catalog.GraphGates,
    catalog.TimeSeriesGates,
    catalog.StatsGates,
    catalog.StatTestGates,
    catalog.ExperimentGates,
    catalog.RankingGates,
    catalog.PreferenceGates,
    catalog.PrivacyGates,
    catalog.RetailGates)

  private def assemble[V](part: catalog.GateFamily => Seq[(String, V)],
      what: String): Map[String, V] = {
    val all = families.flatMap(part)
    val dups = all.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate gate ids across families ($what): ${dups.toSeq.sorted}")
    all.toMap
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    assemble(_.queries, "queries")

  lazy val oracleSql: Map[String, String] = assemble(_.oracleSql, "oracleSql")
}
