package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide injection path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose every
  * inventoried function to pure SQL — no `register(spark)` calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects every graft function into a fresh session") {
    // park the suite-shared session (if any) and build a NEW session over
    // the same SparkContext with the extensions applied. withExtensions
    // exercises the same injection hook `--conf spark.sql.extensions=
    // graft.GraftExtensions` loads; the config-string spelling can't be
    // tested here because Spark reads it from the SparkContext conf,
    // which earlier suites in this JVM have already created.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // a scalar codegen kernel, via SQL only
      val h = ext.sql("SELECT graft_xxhash64_0('promoted') AS h")
        .collect()(0).getLong(0)
      assert(h == functions.XxHash64.hashString("promoted", 0L))
      // a vector kernel
      val d = ext.sql(
        """SELECT graft_dot_e9(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)),
          |                    array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)))"""
          .stripMargin).collect()(0).getLong(0)
      assert(d == 1000000000L + 250000000L)
      // an aggregate (TypedImperative sketch) grouping through SQL
      val hll = ext.sql(
        "SELECT graft_hll_registers(CAST(id AS STRING), 12) FROM range(100)")
        .collect()
      assert(hll.length == 1 && hll(0).getString(0).nonEmpty)
      // and the complete inventory resolves
      functions.GraftRegistry.all.foreach { case (name, _) =>
        assert(ext.sessionState.catalog.isRegisteredFunction(
          FunctionIdentifier(name)), s"$name not injected")
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
