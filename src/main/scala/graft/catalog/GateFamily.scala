package graft
package catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family of oracled gates: catalog entries (the Spark-side
  * plans) and their DuckDB oracle SQL, both keyed by gate id.
  * [[graft.SparkEntry]] assembles the driver-contract maps from
  * every family and rejects duplicate ids. */
trait GateFamily {
  def queries: Seq[(String, (SparkSession, String) => DataFrame)]
  def oracleSql: Seq[(String, String)]
}
