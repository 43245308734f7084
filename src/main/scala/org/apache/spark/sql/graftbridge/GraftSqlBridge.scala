package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` seam the dailystore SQL DML commands need:
  * wrap an already-resolved LogicalPlan as a DataFrame
  * (`classic.Dataset.ofRows` is sql-package-private; a bridge object
  * under `org.apache.spark.sql` is the established pattern for
  * extensions that execute analyzer-rewritten commands — the
  * alternative would re-parse or re-resolve plans the analyzer already
  * resolved). Nothing else may go through here without the same
  * one-line justification.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
