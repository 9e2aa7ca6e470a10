package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ↔ Expression converters, so graft's
  * native Catalyst expressions can surface as Columns (the supported
  * extension seam for libraries adding codegen'd expressions).
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (the seam custom operators use
    * to surface their plan nodes).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A Scala UDF as a catalyst ScalaUDF expression — what a function-
    * registry builder must return (a Column-API wrapper would embed an
    * Unevaluable column node in SQL-originated plans).
    */
  def scalaUdfExpression(
      f: org.apache.spark.sql.expressions.UserDefinedFunction,
      args: Seq[Expression]): Expression =
    classic.UserDefinedFunctionUtils.toScalaUDF(
      f.asInstanceOf[org.apache.spark.sql.expressions.SparkUserDefinedFunction], args)

  /** Register a builder-based SQL function into a RUNNING session's
    * function registry (the extensions path only applies at session
    * construction).
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
