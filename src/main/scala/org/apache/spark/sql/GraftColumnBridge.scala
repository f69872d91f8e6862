package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column ↔ Expression conversions, so
  * graft's native Catalyst expressions (e.g.
  * graft.functions.FloatDotProduct) can be used from the public Column
  * API. Lives in org.apache.spark.sql only for access; no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
