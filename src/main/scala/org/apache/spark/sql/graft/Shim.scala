package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters.
  * Extension libraries conventionally host such shims inside the
  * `org.apache.spark.sql` namespace — the reference does the same with
  * its `org.apache.spark.sql.iceberg` package
  * (reference: src/main/scala/org/apache/spark/sql/iceberg/...).
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert a Column's node tree to a catalyst Expression.
    * (`ExpressionUtils.expression` returns a lazy ColumnNodeExpression
    * wrapper whose children are opaque — useless for tree walking.)
    */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Materialize a DataFrame from a logical plan (analysis deferred to
    * this call — used by graft RunnableCommands).
    */
  def ofRows(session: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unresolved logical plan behind a classic DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.logical

  /** Spark's V1 bucket-file naming (`_00003` before the extension) —
    * delegated to the same `BucketingUtils` `FileSourceScanExec` parses
    * with, so names written by graft's sbucket path and names read by
    * Spark's bucketed scan can never drift.
    */
  def bucketIdSuffix(id: Int): String =
    org.apache.spark.sql.execution.datasources.BucketingUtils.bucketIdToString(id)

  def parseBucketId(fileName: String): Option[Int] =
    org.apache.spark.sql.execution.datasources.BucketingUtils.getBucketId(fileName)
}
