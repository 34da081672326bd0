package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal Column <-> catalyst Expression bridge. The classic helpers are
  * private[sql] in Spark 4.x, so this one-file shim lives in the sql
  * package scope; everything else in the engine stays in package graft.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
