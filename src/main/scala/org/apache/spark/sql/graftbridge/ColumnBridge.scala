package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` surface for the graft library's custom
 * Catalyst expressions: Column↔Expression conversion and session-local
 * function registration. Lives under `org.apache.spark.sql` so the
 * `private[sql]` members are in scope — the standard technique for Spark
 * extension libraries that must attach expressions to an already-built
 * session (SparkSessionExtensions only applies at session construction).
 */
object ColumnBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → catalyst Expression conversion through the session's
    * ColumnNode converter. Unlike [[expression]] (a lazy ColumnNodeExpression
    * wrapper the analyzer only unwraps at Dataset API boundaries), the result
    * is a plain catalyst tree — required when embedding user Columns into a
    * custom LogicalPlan, where the wrapper would survive analysis and fail
    * task serialization. */
  def catalystExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Analyzed logical plan of a DataFrame (classic runtime). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed

  /** Build a DataFrame over a (possibly custom) logical plan — the entry
    * point for library-defined operators (`graft.plans`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register (or replace) a session-local expression builder, callable from
    * SQL and `call_function`. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
