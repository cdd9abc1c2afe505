package org.apache.spark.sql.graftaudit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Tooling-only bridge to `classic.Dataset.ofRows` (private[sql]): lets
  * the plan auditor (graft.PlanReport) evaluate a SUBTREE of an analyzed
  * plan — e.g. a Window operator's child — as a DataFrame, to MEASURE
  * the cardinality of window partition keys instead of guessing it.
  * Standard Spark-extension technique (a package-object shim into the
  * sql package); no operator uses this at runtime.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
