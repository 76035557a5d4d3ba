package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal access bridge into `private[sql]` Spark internals. Spark 4 made
 * `Column` construction go through the ColumnNode layer (for Spark Connect);
 * the classic-session converter `ExpressionUtils` is `private[sql]`, so this
 * one-file subpackage of `org.apache.spark.sql` re-exports exactly the two
 * conversions the graft expression library needs. Nothing else from Spark
 * internals is touched.
 */
object Bridge {
  /** Wrap a Catalyst expression as a user-facing classic Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a classic Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — what lets an optimizer rule hand a matched
    * SUBTREE to the Dataset API (e.g. the batch-kNN rewrite routing a
    * query-side plan through the typed centroid fan-out). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
