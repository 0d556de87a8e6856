package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (JDK
  * `java.text.Normalizer`, canonical composition) — the missing
  * preprocessing primitive for text dedup at corpus scale: the SAME
  * visible string arrives from different sources as precomposed
  * (U+00E9 "é") or decomposed ("e" + U+0301) code points, and every
  * byte-keyed operator downstream (exact dedup, minhash shingles,
  * fingerprints, group-bys) silently treats them as different documents
  * unless the text is canonicalized first. Spark ships no NFC builtin;
  * a Scala UDF would fence whole-stage codegen on the hottest
  * projection in the pipeline, so this is a native expression with
  * `doGenCode`.
  *
  * ASCII fast path: a pure-ASCII string is NFC by construction (no
  * combining marks, no compatibility forms), so the normalizer — which
  * allocates even for already-normal input — is skipped entirely after
  * one byte scan. At 100 TB of mostly-ASCII text the fast path IS the
  * operator. The DuckDB oracle reproduces the semantics exactly with
  * its `nfc_normalize`.
  */
object NfcNormalize {

  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  /** Idempotently register `nfc_normalize` for SQL use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      GraftFunctions.arity("nfc_normalize", 1)(exprs =>
        NfcNormalizeExpr(exprs.head)), "scala_udf")
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
