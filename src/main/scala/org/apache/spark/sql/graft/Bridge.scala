package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeExpression, ExpressionColumnNode}

/** Expression ↔ Column bridge for Spark 4's split Column API.
  *
  * Spark 4 made `Column` a backend-agnostic wrapper over `ColumnNode`;
  * building a Column from a Catalyst `Expression` (and back) is
  * `private[sql]`, so custom codegen expressions need this one-file
  * residence in the `org.apache.spark.sql` namespace — the same pattern
  * public Spark extension libraries use.
  */
object Bridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ColumnNodeExpression(c.node)

  /** Analyzed logical plan of a DataFrame (attributes resolved, ready to
    * be wired as a child of a custom logical node). */
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame over a custom logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a SQL function on an EXISTING session (SparkSessionExtensions
    * only applies at session construction). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }
}
