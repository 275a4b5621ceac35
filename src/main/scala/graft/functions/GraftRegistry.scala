package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** The single inventory of graft's custom SQL functions.
  *
  * Every expression family exposes its `(name, builder)` pairs here; the
  * per-session `register(spark)` helpers and the cluster-wide
  * [[graft.GraftExtensions]] injection both iterate THIS list, so the two
  * registration paths can never drift.
  */
object GraftRegistry {
  type Builders = Seq[(String, Seq[Expression] => Expression)]

  /** Idempotent per-session registration (temp functions). Skips names the
    * session registry already holds: every graft builder is a static object,
    * so re-registering can only produce the exact same function — and the
    * `WARN SimpleFunctionRegistry: replaced a previously registered
    * function` it triggers (thousands of lines across an 88-query bench)
    * buries real warnings. Graft names never collide with Spark built-ins
    * (first registration is warning-free), so exists ⇒ already ours. */
  def registerTemp(spark: SparkSession, builders: Builders): Unit =
    builders.foreach { case (name, builder) =>
      val registry = spark.sessionState.functionRegistry
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Every graft function, across all families. */
  def all: Builders =
    GraftFunctions.builders ++
      VectorExpressions.builders ++
      PqExpressions.builders ++
      PolyHash64.builders ++
      RollingMinHash.builders ++
      SortedLongIntersect.builders ++
      WordShingles.builders ++
      HashedClassifier.builders ++
      Blocklist.builders ++
      CharEntropyFn.builders ++
      StringSimilarity.builders ++
      graft.agg.HllSketch.builders ++
      graft.agg.CountMinSketch.builders ++
      graft.agg.BloomSketch.builders ++
      graft.agg.MisraGries.builders ++
      graft.agg.BoundedSample.builders ++
      graft.agg.QuantileSketch.builders

  /** Register every graft function on a live session in one call. */
  def registerAll(spark: SparkSession): Unit = registerTemp(spark, all)
}
