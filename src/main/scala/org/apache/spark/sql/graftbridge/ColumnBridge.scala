package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so this lives under the org.apache.spark.sql package —
  * the standard pattern for Spark extension libraries that define native
  * Catalyst expressions (same technique as spark-daria/frameless shims).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
