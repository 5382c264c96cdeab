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

  /** The physical plan of a streaming query's LAST micro-batch (the
    * streaming half of the plan-fingerprint tripwire — VERDICT r13 #1).
    * `StreamExecution.lastExecution` is `private[sql]`-reachable only,
    * hence this second shim entry. None before the first batch plans or
    * for a non-micro-batch query object.
    */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[org.apache.spark.sql.execution.SparkPlan] = q match {
    case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan)
    case _ => None
  }
}
