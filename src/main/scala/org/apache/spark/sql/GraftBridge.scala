package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column ↔ catalyst
  * Expression converters, so graft's custom expressions can be used
  * from the public DataFrame API without per-session function
  * registration. Placing extension shims in `org.apache.spark.sql` is
  * the standard technique used by open-source Spark libraries that ship
  * native expressions.
  */
object GraftBridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a user-facing Column to its catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder into an EXISTING session's function
    * registry (the extensions path, `spark.sql.extensions`, only covers
    * sessions built after configuration). */
  def registerFunction(spark: SparkSession, name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
}
