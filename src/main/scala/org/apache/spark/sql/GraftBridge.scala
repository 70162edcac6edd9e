package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion.
  *
  * Spark 4.x moved `Column` to a connect-compatible ColumnNode wrapper; the
  * only supported in-JVM conversion is `classic.ExpressionUtils`, which is
  * `private[sql]`. Declaring this one-file shim inside package
  * `org.apache.spark.sql` is the standard library-extension pattern (the
  * same trick every Spark connector uses for private[sql] APIs).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
