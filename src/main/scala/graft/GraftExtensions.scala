package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extension entry point: makes the engine's custom expressions
  * available in ANY session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), i.e.
  * without calling [[graft.functions.GraftFunctions.registerAll]] manually.
  *
  * Expression-level injection plus ONE peephole optimizer rule
  * ([[graft.plans.PortableHash28Rewrite]]: the portable conv∘substring∘md5
  * hash idiom → the native [[graft.functions.Hash28]]). The engine
  * deliberately has no custom logical plans or planner strategies — every
  * operator is expressed through Catalyst built-ins plus typed group
  * processing (see SURVEY §4: the one non-built-in physical piece, the
  * bin-packer, is a `groupByKey.mapGroups`, which needs no extension).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.PortableHash28Rewrite)
    // variant-shred file skipping: variant_get predicates over declared
    // shred paths gain a pushable twin on the _shred_* metadata column
    ext.injectOptimizerRule(_ => graft.plans.VariantShredPrune)
    // SQL views over graft catalogs (Spark 4's ViewCatalog SPI has no
    // built-in SQL routing — see GraftViewRules): DDL intercepts at
    // parse time, view reads inline during resolution
    ext.injectParser((session, delegate) =>
      new graft.sources.v2.GraftViewParser(session, delegate))
    ext.injectResolutionRule(session =>
      graft.sources.v2.GraftViewSubstitution(session))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.PolyHash64Expr].getName, "poly_hash"),
      graft.functions.GraftFunctions.arity("poly_hash", 1)(exprs =>
        graft.functions.PolyHash64Expr(exprs.head))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("long_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.LongArrayDot].getName, "long_dot"),
      graft.functions.GraftFunctions.arity("long_dot", 2)(exprs =>
        graft.functions.LongArrayDot(exprs(0), exprs(1)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("double_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DoubleArrayDot].getName, "double_dot"),
      graft.functions.GraftFunctions.arity("double_dot", 2)(exprs =>
        graft.functions.DoubleArrayDot(exprs(0), exprs(1)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      graft.functions.GraftFunctions.arity("minhash_sig", 1)(exprs =>
        graft.functions.GraftFunctions.defaultMinHashSig(exprs.head))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SimHashSig].getName, "simhash_sig"),
      graft.functions.GraftFunctions.arity("simhash_sig", 1)(exprs =>
        graft.functions.SimHashSig(exprs.head, 16))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("st_point"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.StPointExpr].getName, "st_point"),
      graft.functions.GraftFunctions.arity("st_point", 2)(exprs =>
        graft.functions.StPointExpr(exprs(0), exprs(1)))))
    Seq(("st_xmin", 0), ("st_ymin", 1), ("st_xmax", 2), ("st_ymax", 3))
      .foreach { case (n, k) =>
        ext.injectFunction((
          new org.apache.spark.sql.catalyst.FunctionIdentifier(n),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[graft.functions.StBboxEdgeExpr].getName, n),
          graft.functions.GraftFunctions.arity(n, 1)(exprs =>
            graft.functions.StBboxEdgeExpr(exprs.head, k, n))))
      }
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.NfcNormalizeExpr].getName, "nfc_normalize"),
      graft.functions.GraftFunctions.arity("nfc_normalize", 1)(exprs =>
        graft.functions.NfcNormalizeExpr(exprs.head))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.WinnowFingerprints].getName, "winnow_fingerprints"),
      graft.functions.GraftFunctions.arity("winnow_fingerprints", 1)(exprs =>
        graft.functions.WinnowFingerprints(exprs.head, 3, 4))))
  }
}
