package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so the engine's native
  * Catalyst expressions ([[graft.functions.Md5LongExpr]] et al.) can be used
  * as plain `Column`s without a session-bound function registry. Lives in
  * the `org.apache.spark.sql` package solely for access — the standard
  * pattern for Spark-4 extension libraries (the Scala-level `private[sql]`
  * members are public in bytecode and stable across the 4.x classic API).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
