package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4 made the Expression<->Column converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so custom native
  * expressions need this one-file shim inside the `org.apache.spark.sql`
  * namespace. No Spark internals are modified — this only re-exports the
  * two converters the pre-4.0 `new Column(expr)` constructor used to expose.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
