package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative long columns, `bits`
  * low bits each → one `2*bits`-bit code.
  *
  * Sorting/range-partitioning by the code clusters rows so that BOTH
  * dimensions are locally narrow inside every output file — the data-lake
  * layout optimization that makes min/max file skipping effective for
  * predicates on either column (a single-column sort only prunes its own
  * column). See [[graft.sources.ZOrderLayout]].
  */
case class MortonCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"morton_code requires (bigint, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonCode.interleave($a, $b, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Bit-interleave the low `bits` of x (even positions) and y (odd). */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((x >>> i) & 1L) << (2 * i)
      r |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  def morton(a: Column, b: Column, bits: Int = 16): Column =
    ColumnBridge.column(MortonCode(ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}
