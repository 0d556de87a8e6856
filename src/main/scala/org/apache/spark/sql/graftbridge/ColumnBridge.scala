package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. `ExpressionUtils` is `private[sql]` in
  * Spark 4, so the engine's native expressions (LongArrayDot, PolyHash64)
  * get their Column handles through this sql-subpackage shim — the standard
  * pattern for Spark extension libraries that expose custom expressions at
  * the DataFrame API level without requiring function registration. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
