package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge the graft custom-operator surface
  * needs: turn a hand-built `LogicalPlan` into a `DataFrame`. Lives in
  * Spark's own package namespace (the standard extension-library
  * technique — `Dataset.ofRows` is the blessed internal constructor,
  * private to the `sql` package tree) and contains NO logic, so the
  * graft codebase proper never reaches into Spark internals directly.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[org.apache.spark.sql.Row] =
    Dataset.ofRows(spark, plan)

  /** Column → Catalyst Expression via the SESSION's converter (eager):
    * Spark 4 wraps Columns in ColumnNodes, and the lazy
    * `ExpressionUtils.expression` wrapper keeps the non-serializable
    * internal node alive inside the plan — the session converter
    * produces plain catalyst expressions instead. */
  def expression(spark: SparkSession, c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.expression(c)
}
