package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the `private[sql]` DataFrame constructor: a library that
  * contributes its own logical operators (graft.plans.AsOfJoinNode) needs
  * `Dataset.ofRows` to hand the composed plan back to the user as an
  * ordinary DataFrame. Spark scopes that constructor to the sql package
  * tree, so this one-file shim lives inside it — the standard pattern for
  * catalyst-extending libraries; everything else in the engine stays in
  * the public API.
  */
object GraftSqlShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
