package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL wiring for [[GraftCatalog]]'s views. Spark 4 ships the
  * `ViewCatalog` SPI with NO built-in SQL routing (the analyzer's
  * `ResolveSessionCatalog` hard-errors `CREATE VIEW` on any non-session
  * catalog, and nothing calls `loadView`) — so, exactly like Iceberg's
  * Spark integration, the routing lives in session extensions
  * ([[graft.GraftExtensions]]):
  *
  *   - [[GraftViewParser]] (injectParser) intercepts view DDL at PARSE
  *     time — before `ResolveSessionCatalog` can reject it — and
  *     rewrites CREATE/DROP/SHOW/ALTER VIEW that target a graft catalog
  *     into runnable commands against [[GraftCatalog]]'s ViewCatalog
  *     face. DDL on other catalogs passes through untouched.
  *   - [[GraftViewSubstitution]] (injectResolutionRule) replaces a
  *     VIEW READ (`SELECT … FROM cat.ns.v`) with the parsed stored SQL
  *     under a `SubqueryAlias` — the same inlining Spark performs for
  *     its own persisted views. CTE substitution runs in an EARLIER
  *     analyzer batch, so a `WITH v AS (…)` alias correctly shadows a
  *     like-named view; nested views substitute on later fixpoint
  *     iterations (a cyclic definition dies on the analyzer's iteration
  *     limit instead of looping).
  *
  * A view inlines to its definition BEFORE optimization, so pushdown,
  * partition pruning, and storage-partitioned joins all apply through
  * it — a view costs nothing at any scale; every DDL is one small JSON.
  */
object GraftViewRules {

  /** Resolve `parts` the way Spark resolves relation names: an explicit
    * leading catalog name wins; otherwise the CURRENT catalog +
    * namespace. Some only when the owning catalog is a [[GraftCatalog]]. */
  def graftTarget(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = session.sessionState.catalogManager
    if (parts.size >= 2) {
      // an EXPLICIT leading catalog name ends resolution at that
      // catalog — `spark_catalog.db.t` must never fall back to being
      // read as a current-graft-catalog-relative name
      val headIsCatalog =
        try { cm.catalog(parts.head); true }
        catch { case _: Exception => false }
      if (headIsCatalog) cm.catalog(parts.head) match {
        case g: GraftCatalog =>
          Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
        case _ => None
      }
      else cm.currentCatalog match {
        case g: GraftCatalog =>
          Some((g, Identifier.of(parts.init.toArray, parts.last)))
        case _ => None
      }
    } else if (parts.size == 1) cm.currentCatalog match {
      case g: GraftCatalog =>
        Some((g, Identifier.of(cm.currentNamespace, parts.head)))
      case _ => None
    } else None
  }

  /** Same resolution for a NAMESPACE reference (SHOW VIEWS IN …). */
  def graftNamespace(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Array[String])] = {
    val cm = session.sessionState.catalogManager
    if (parts.nonEmpty) {
      val headIsCatalog =
        try { cm.catalog(parts.head); true }
        catch { case _: Exception => false }
      if (headIsCatalog) cm.catalog(parts.head) match {
        case g: GraftCatalog => Some((g, parts.tail.toArray))
        case _ => None // explicit non-graft catalog: not ours
      }
      else cm.currentCatalog match {
        case g: GraftCatalog => Some((g, parts.toArray))
        case _ => None
      }
    } else cm.currentCatalog match {
      case g: GraftCatalog => Some((g, cm.currentNamespace))
      case _ => None
    }
  }

  private def nameParts(child: LogicalPlan): Option[Seq[String]] = child match {
    case u: UnresolvedIdentifier => Some(u.nameParts)
    case u: UnresolvedView => Some(u.multipartIdentifier)
    case u: UnresolvedTableOrView => Some(u.multipartIdentifier)
    case _ => None
  }

  /** The parse-time DDL rewrite shared by [[GraftViewParser.parsePlan]]. */
  def rewriteDdl(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case cv: CreateView =>
        (for {
          parts <- nameParts(cv.child)
          (g, ident) <- graftTarget(session, parts)
        } yield CreateGraftViewCommand(g, ident,
          cv.originalText.getOrElse(sys.error(
            "graft views: CREATE VIEW carries no SQL text")),
          cv.userSpecifiedColumns, cv.comment, cv.properties,
          cv.allowExisting, cv.replace)).getOrElse(cv)
      case dv: DropView =>
        (for {
          parts <- nameParts(dv.child)
          (g, ident) <- graftTarget(session, parts)
        } yield DropGraftViewCommand(g, ident, dv.ifExists)).getOrElse(dv)
      case sv: ShowViews =>
        (sv.namespace match {
          case ns: UnresolvedNamespace =>
            graftNamespace(session, ns.multipartIdentifier).map {
              case (g, nsParts) =>
                ShowGraftViewsCommand(g, nsParts, sv.pattern, sv.output)
            }
          case _ => None
        }).getOrElse(sv)
      case s: SetViewProperties =>
        (for {
          parts <- nameParts(s.child)
          (g, ident) <- graftTarget(session, parts)
        } yield AlterGraftViewPropsCommand(g, ident,
          sets = s.properties.toSeq, unsets = Nil,
          unsetIfExists = false)).getOrElse(s)
      case u: UnsetViewProperties =>
        (for {
          parts <- nameParts(u.child)
          (g, ident) <- graftTarget(session, parts)
        } yield AlterGraftViewPropsCommand(g, ident, sets = Nil,
          unsets = u.propertyKeys, unsetIfExists = u.ifExists)).getOrElse(u)
      case a: AlterViewAs =>
        (for {
          parts <- nameParts(a.child)
          (g, ident) <- graftTarget(session, parts)
        } yield CreateGraftViewCommand(g, ident, a.originalText,
          userCols = Nil, comment = None, props = Map.empty,
          allowExisting = false, replace = true,
          requireExists = true)).getOrElse(a)
      case r: RenameTable if r.isView =>
        (for {
          parts <- nameParts(r.child)
          (g, ident) <- graftTarget(session, parts)
          if g.viewExists(ident)
        } yield RenameGraftViewCommand(g, ident, r.newName)).getOrElse(r)
      case other => other
    }
}

/** Delegating parser that applies [[GraftViewRules.rewriteDdl]] to every
  * parsed statement — the injection point that beats the analyzer's
  * non-session-catalog CREATE VIEW rejection deterministically. */
class GraftViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    // ref DDL first: `ALTER TABLE … CREATE BRANCH` is extension grammar
    // the delegate would REJECT, so it cannot go through parse-then-
    // rewrite like the view DDL below
    GraftRefDdl.parse(session, sqlText)
      .orElse(GraftWriteDdl.parse(session, sqlText))
      .getOrElse(
        GraftViewRules.rewriteDdl(session, delegate.parsePlan(sqlText)))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Inline graft-view reads: `UnresolvedRelation` naming a stored view
  * becomes `SubqueryAlias(name, column-aliased parsed SQL)`. */
case class GraftViewSubstitution(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        GraftViewRules.graftTarget(session, u.multipartIdentifier) match {
          case Some((g, ident)) if g.viewExists(ident) =>
            val v = g.loadView(ident)
            val parsed = session.sessionState.sqlParser.parsePlan(v.query())
            val aliased =
              if (v.columnAliases() != null && v.columnAliases().nonEmpty)
                UnresolvedSubqueryColumnAliases(
                  v.columnAliases().toIndexedSeq, parsed)
              else parsed
            SubqueryAlias(ident.name, aliased)
          case _ => u
        }
    }
}

/** CREATE [OR REPLACE] VIEW … AS <sql> (also ALTER VIEW … AS via
  * `requireExists`): analysis-only pass over the stored SQL pins the
  * schema at definition time; the document write is one JSON. */
case class CreateGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
    sql: String, userCols: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean,
    requireExists: Boolean = false) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (requireExists && !catalog.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    if (catalog.viewExists(ident) && allowExisting) return Nil // IF NOT EXISTS
    val analyzed = spark.sql(sql) // analysis only, nothing executes
    val qCols = analyzed.schema.fieldNames
    require(userCols.isEmpty || userCols.length == qCols.length,
      s"graft views: $ident declares ${userCols.length} columns but the " +
        s"query produces ${qCols.length}")
    val aliases =
      if (userCols.isEmpty) qCols else userCols.map(_._1).toArray
    val comments =
      if (userCols.isEmpty) qCols.map(_ => "")
      else userCols.map(_._2.getOrElse("")).toArray
    val schema = StructType(analyzed.schema.fields.zip(aliases).map {
      case (f, a) => StructField(a, f.dataType, f.nullable) })
    val cm = spark.sessionState.catalogManager
    val allProps = props ++ comment.map(
      org.apache.spark.sql.connector.catalog.ViewCatalog.PROP_COMMENT -> _)
    import scala.jdk.CollectionConverters._
    val info = new ViewInfo(ident, sql, catalog.name(),
      cm.currentNamespace, schema, qCols, aliases, comments,
      allProps.asJava)
    if (replace || requireExists) catalog.replaceView(info, orCreate = true)
    else catalog.createView(info)
    Nil
  }
}

case class DropGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

case class ShowGraftViewsCommand(catalog: GraftCatalog,
    namespace: Array[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = catalog.listViews(namespace.toIndexedSeq: _*)
      .map(_.name).toIndexedSeq
    val kept: Seq[String] = pattern match {
      case None => names
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(names, p)
    }
    kept.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

case class AlterGraftViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, sets: Seq[(String, String)], unsets: Seq[String],
    unsetIfExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val changes: Seq[ViewChange] =
      sets.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unsets.map(ViewChange.removeProperty)
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

case class RenameGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(ident,
      Identifier.of(newName.init.toArray, newName.last))
    Nil
  }
}
