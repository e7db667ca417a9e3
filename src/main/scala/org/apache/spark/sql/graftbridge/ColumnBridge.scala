package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
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

  /** Register (or replace) a session-local expression builder, callable from
    * SQL and `call_function`. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
