package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.v2.{GraftTable, VariantShred}

/** File-skipping for `variant_get` predicates over SHREDDED variant
  * columns (Iceberg v3 shredding — see [[graft.sources.v2.VariantShred]]).
  *
  * `variant_get(doc, '$.mon', 'bigint') > 5` is not expressible in the
  * DSv2 filter algebra, so it never reaches the scan builder and every
  * variant predicate is a full-scan residual. But a declared shred path
  * also surfaces as the metadata column `_shred_doc_mon`, whose value
  * is BY CONSTRUCTION the same extraction (try-cast semantics), and
  * whose per-file bounds the writer records. This rule finds such
  * conjuncts and ANDs the equivalent metadata-column comparison — a
  * plain column predicate Spark pushes to the scan, which then skips
  * files on manifest bounds. The original conjunct stays (row-level
  * truth); the twin is implied by it, so results never change.
  *
  * Runs in the extended operator-optimization batch, BEFORE V2 scan
  * pushdown. A Project above restores the relation's original output. */
object VariantShredPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftTable] &&
          // idempotence: a rewritten Filter already references _shred_
          !cond.references.exists(_.name.startsWith(VariantShred.MetaPrefix)) =>
      val table = r.table.asInstanceOf[GraftTable]
      val decls = table.variantShredDecls
      if (decls.isEmpty) f
      else {
        val twins = splitConjuncts(cond).flatMap(c => twinOf(c, decls, r))
        if (twins.isEmpty) f
        else {
          val metaAttrs = twins.map(_._1).distinctBy(_.exprId)
          val withMeta = r.copy(output = r.output ++ metaAttrs)
          val newCond = (cond +: twins.map(_._2)).reduce(And)
          Project(r.output, Filter(newCond, withMeta))
        }
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, rr) => splitConjuncts(l) ++ splitConjuncts(rr)
    case other => Seq(other)
  }

  /** A conjunct's pushable twin: `variant_get(col, '$.field', type) cmp
    * literal` (either operand order) where (col, field, type) is a
    * declared shred — rebuilt as the same comparison on the shred
    * metadata attribute. */
  private def twinOf(c: Expression, decls: Seq[VariantShred.Decl],
      r: DataSourceV2Relation): Option[(AttributeReference, Expression)] = {

    def declFor(e: Expression): Option[VariantShred.Decl] = e match {
      case VariantGet(a: AttributeReference,
          Literal(p: UTF8String, _), dt, _, _) =>
        decls.find(d => d.col == a.name && d.path == p.toString &&
          d.dt == dt && r.outputSet.contains(a))
      case _ => None
    }

    def metaAttrOf(d: VariantShred.Decl): Option[AttributeReference] =
      r.metadataOutput.collectFirst {
        case a: AttributeReference if a.name == d.metaName => a
      }

    c match {
      case cmp: BinaryComparison if !cmp.isInstanceOf[EqualNullSafe] =>
        (cmp.left, cmp.right) match {
          case (vg, lit: Literal) =>
            declFor(vg).flatMap(d => metaAttrOf(d).map(a =>
              (a, cmp.withNewChildren(Seq(a, lit)))))
          case (lit: Literal, vg) =>
            declFor(vg).flatMap(d => metaAttrOf(d).map(a =>
              (a, cmp.withNewChildren(Seq(lit, a)))))
          case _ => None
        }
      case _ => None
    }
  }
}
