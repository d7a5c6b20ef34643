package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters so graft's
  * native Catalyst expressions (e.g. [[graft.functions.FloatVecDot]]) can be
  * exposed as `Column`s — the supported extension-point pattern for
  * libraries shipping custom expressions on Spark 4's ColumnNode API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
