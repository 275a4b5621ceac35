package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** The one sanctioned bridge into Spark's `private[sql]` plan-construction
  * seam: building a DataFrame from a CUSTOM LogicalPlan node requires
  * `Dataset.ofRows`, which Spark scopes to its own package — the same
  * mechanism every serious Spark extension library uses for custom
  * operators (a connector-style alternative does not exist for logical
  * plans). Kept to exactly one method so the internal surface area this
  * library depends on stays auditable. */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
