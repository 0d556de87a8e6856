package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string —
  * `h = fold(c => (h*131 + c) mod 1e9+7)` over UTF-16 code units.
  *
  * This is the engine's document-fingerprint primitive (content-defined
  * hashing for dedup). A native expression (with `doGenCode`) keeps it inside
  * whole-stage codegen — no UDF boxing, no codegen fence — which matters when
  * fingerprinting billions of documents. Constants chosen so `h*131 + c`
  * stays < 2^38: no int64 overflow, hence identical under ANSI mode and
  * portable to any engine (the DuckDB oracle reproduces it with
  * `list_reduce`).
  */
object PolyHash64 {
  final val Base = 131L
  final val Mod = 1000000007L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    h
  }

  /** Idempotently register `poly_hash` for SQL/expr use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", GraftFunctions.arity("poly_hash", 1)(exprs => PolyHash64Expr(exprs.head)), "scala_udf")
}

case class PolyHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"poly_hash requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash64$$.MODULE$$.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash64Expr =
    copy(child = newChild)
}
