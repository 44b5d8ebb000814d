package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a whole-operator extension needs:
  * turning a custom [[LogicalPlan]] into a user-facing [[DataFrame]].
  * `SparkSessionExtensions` covers parser/analyzer/optimizer/planner
  * injection but offers no public constructor for DataFrames over
  * custom logical nodes, so every library that ships one (the standard
  * public technique — e.g. connectors and join-extension libraries)
  * hosts this single call inside the `org.apache.spark.sql` package.
  * Used only by [[graft.plans.AsOf.join]]. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
