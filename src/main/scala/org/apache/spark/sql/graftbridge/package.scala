package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column↔Expression converters — the only
  * supported way in Spark 4's split API to wrap a custom Catalyst
  * `Expression` as a user-facing `Column` (see
  * org.apache.spark.sql.classic.ExpressionUtils in the Spark source).
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `sessionState` is `private[sql]`; exposed for post-hoc function
    * registration into LIVE sessions (graft.core.GraftExtensions.register —
    * builder-time `withExtensions` is silently skipped when getOrCreate
    * returns an existing session).
    */
  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
