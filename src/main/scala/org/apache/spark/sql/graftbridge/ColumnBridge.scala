package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column <-> catalyst Expression
  * conversions (Spark 4 wraps Columns around ColumnNodes; custom catalyst
  * expressions need this hop to surface as user-facing Columns). Lives
  * under org.apache.spark.sql for `private[sql]` access — the standard
  * extension-library technique (see e.g. the Dataset factories in public
  * Spark extension projects).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
