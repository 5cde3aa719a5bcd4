package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. `ExpressionUtils` is private[sql],
  * so the graft library reaches it through this one-file subpackage of
  * `org.apache.spark.sql` — the established pattern for libraries that ship
  * native expressions (the alternative, a SQL-string round-trip per call,
  * would defeat the point of a codegen'd expression).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
