package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private classic Column ↔ Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark 4
  * unified Column over connect/classic and removed the public `.expr`;
  * custom native expressions (graft.functions.*) need this hop to surface
  * as Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
