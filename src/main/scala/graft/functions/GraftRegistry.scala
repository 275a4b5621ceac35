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

  /** Idempotent per-session registration (temp functions). */
  def registerTemp(spark: SparkSession, builders: Builders): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
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
      graft.agg.HllSketch.builders ++
      graft.agg.CountMinSketch.builders ++
      graft.agg.BloomSketch.builders ++
      graft.agg.MisraGries.builders

  /** Register every graft function on a live session in one call. */
  def registerAll(spark: SparkSession): Unit = registerTemp(spark, all)
}
