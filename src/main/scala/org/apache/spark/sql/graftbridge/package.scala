package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), so graft can expose
  * custom Catalyst expressions through the public Column API. This is the
  * standard extension-package pattern; nothing else from the private
  * surface is touched.
  */
package object graftbridge {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def columnExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
