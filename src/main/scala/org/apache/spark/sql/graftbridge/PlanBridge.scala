package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one bridge into Spark's `private[sql]` plan-construction API.
  *
  * Wrapping a custom [[LogicalPlan]] node into a user-facing DataFrame
  * requires `Dataset.ofRows`, which Spark scopes `private[sql]` — the
  * standard extension-library pattern (used by every open-source Spark
  * connector that adds whole-plan operators) is a minimal shim compiled
  * into an `org.apache.spark.sql` subpackage. Everything else in this
  * repo stays on public API; keep this object to exactly one method so
  * the private-API surface is auditable at a glance.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
