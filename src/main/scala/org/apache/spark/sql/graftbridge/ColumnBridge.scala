package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `Column` wraps a ColumnNode and no longer exposes `.expr`;
  * the classic-mode converters live in `org.apache.spark.sql.classic
  * .ExpressionUtils`, which is `private[sql]` — hence this shim inside
  * the `org.apache.spark.sql` package namespace (the standard technique
  * for Spark extension libraries building native expressions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
