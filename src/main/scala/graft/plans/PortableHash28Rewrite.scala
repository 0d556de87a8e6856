package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.functions.Hash28

/** Optimizer rule: rewrite the engine's PORTABLE hash idiom
  *
  *   `CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)`
  *
  * (what `TextOps.portableHash28` builds, and what any user copying the
  * oracle SQL would write) into the native [[graft.functions.Hash28]]
  * expression — same 28 bits straight off the digest, skipping the 32-char
  * hex-string materialization and the base-16 re-parse per row. The rule is
  * a pure peephole: value-identical by construction (spec-checked), fires
  * only on the exact literal shape, and leaves every other md5/conv use
  * untouched.
  *
  * Demonstrates the `injectOptimizerRule` extension point; the engine's
  * operators otherwise need no custom plans (SURVEY §4) — this rule makes
  * the PORTABLE formulation fast rather than introducing new semantics.
  */
object PortableHash28Rewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c: Cast if c.dataType == LongType =>
      c.child match {
        case Conv(Substring(Md5(str), Literal(1, IntegerType), Literal(7, IntegerType)),
              Literal(16, IntegerType), Literal(10, IntegerType), _) =>
          stringInput(str).map(Hash28).getOrElse(c)
        case _ => c
      }
  }

  /** md5 takes binary; a string argument arrives wrapped in an implicit
    * cast. Unwrap it — the digest of CAST(s AS BINARY) is the digest of
    * the UTF-8 bytes, which is exactly what the kernel hashes. */
  private def stringInput(e: Expression): Option[Expression] = e match {
    case Cast(inner, BinaryType, _, _) if inner.dataType == StringType => Some(inner)
    case _ => None
  }

  /** Install into a session's extra optimizations (idempotent) — for
    * sessions not built with `spark.sql.extensions=graft.GraftExtensions`.
    * The check-and-append is synchronized on the session: extraOptimizations
    * is a plain var, and two threads racing the first install could lose a
    * rule (ours or another extension's appended concurrently). */
  def ensure(spark: SparkSession): Unit = spark.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) spark.experimental.extraOptimizations = cur :+ this
  }
}
