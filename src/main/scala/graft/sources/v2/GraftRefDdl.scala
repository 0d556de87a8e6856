package graft.sources.v2

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.LayoutMaintenance

/** Branch/tag SQL DDL — Iceberg's Spark-extensions grammar
  * (`IcebergSqlExtensions.g4`, the `ALTER TABLE … CREATE BRANCH` family),
  * intercepted at PARSE time exactly like the view DDL: vanilla Spark's
  * parser rejects the syntax outright, so [[GraftViewParser]] tries this
  * TEXT matcher before delegating. Supported:
  *
  * {{{
  *   ALTER TABLE t CREATE [OR REPLACE] BRANCH|TAG [IF NOT EXISTS] name
  *       [AS OF VERSION <snapshotId>] [RETAIN <n> DAYS|HOURS|MINUTES]
  *       [WITH SNAPSHOT RETENTION <m> SNAPSHOTS [<d> DAYS]]
  *   ALTER TABLE t REPLACE BRANCH|TAG name [AS OF VERSION …] [RETAIN …]
  *   ALTER TABLE t DROP BRANCH|TAG [IF EXISTS] name
  * }}}
  *
  * DDL and the `create_branch`/`create_tag`/`drop_ref` procedures
  * converge on [[LayoutMaintenance.setRef]]/[[LayoutMaintenance.dropRef]]
  * — one code path, so a branch born via SQL behaves identically under
  * WAP staging, `VERSION AS OF` reads, and expire's ownership rules.
  * Retention lands as the spec's ref fields (`max-ref-age-ms`;
  * branch-only `min-snapshots-to-keep`/`max-snapshot-age-ms`).
  * Statements over non-graft catalogs pass through to the delegate
  * (which rejects the syntax, as vanilla Spark would).
  */
object GraftRefDdl {

  private val Stmt =
    ("""(?is)^\s*ALTER\s+TABLE\s+([\w.`"]+)\s+""" +
      """(CREATE\s+OR\s+REPLACE|CREATE|REPLACE|DROP)\s+(BRANCH|TAG)\s+""" +
      """(?:(IF\s+NOT\s+EXISTS|IF\s+EXISTS)\s+)?([\w`]+)(.*?)\s*;?\s*$""").r
  private val AsOf = """(?is)\bAS\s+OF\s+VERSION\s+(\d+)""".r
  private val Retain = """(?is)\bRETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES)""".r
  private val SnapRetention =
    """(?is)\bWITH\s+SNAPSHOT\s+RETENTION\s+(\d+)\s+SNAPSHOTS(?:\s+(\d+)\s+DAYS)?""".r

  private def unquote(s: String): String = s.stripPrefix("`").stripSuffix("`")

  private def unitMs(n: Long, unit: String): Long = unit.toUpperCase match {
    case "DAYS" => n * 24L * 3600 * 1000
    case "HOURS" => n * 3600L * 1000
    case _ => n * 60L * 1000
  }

  /** Match + translate, or None for anything that isn't ref DDL over a
    * graft catalog. */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    Stmt.findFirstMatchIn(sqlText).flatMap { m =>
      val parts = m.group(1).split('.').toSeq.map(unquote).filter(_.nonEmpty)
      GraftViewRules.graftTarget(session, parts).map { case (g, ident) =>
        val op = m.group(2).toLowerCase.replaceAll("\\s+", " ")
        val kind = m.group(3).toLowerCase
        val guard = Option(m.group(4)).map(_.toLowerCase.replaceAll("\\s+", " "))
        val tail = m.group(6)
        require(op != "drop" || !guard.contains("if not exists"),
          "DROP takes IF EXISTS, not IF NOT EXISTS")
        require(op == "drop" || !guard.contains("if exists"),
          s"${op.toUpperCase} takes IF NOT EXISTS, not IF EXISTS")
        val snapRet = SnapRetention.findFirstMatchIn(tail)
        // reject trailing garbage the clause matchers did not consume
        val leftover = Seq(AsOf, Retain, SnapRetention)
          .foldLeft(tail)((t, r) => r.replaceAllIn(t, " ")).trim
        require(leftover.isEmpty,
          s"graft ref DDL: cannot parse '$leftover' in: $sqlText")
        GraftRefDdlCommand(g, ident, op, kind,
          refName = unquote(m.group(5)),
          ifNotExists = guard.contains("if not exists"),
          ifExists = guard.contains("if exists"),
          asOfVersion =
            AsOf.findFirstMatchIn(tail).map(_.group(1).toLong),
          maxRefAgeMs = Retain.findFirstMatchIn(tail)
            .map(r => unitMs(r.group(1).toLong, r.group(2))),
          minSnapshotsToKeep = snapRet.map(_.group(1).toInt),
          maxSnapshotAgeMs = snapRet.flatMap(r => Option(r.group(2)))
            .map(d => unitMs(d.toLong, "DAYS")))
      }
    }
}

/** Write-layout DDL — the other Iceberg-extensions `ALTER TABLE` family:
  *
  * {{{
  *   ALTER TABLE t WRITE ORDERED BY c1, c2      -- sort + range dist
  *   ALTER TABLE t WRITE LOCALLY ORDERED BY c1  -- sort, no shuffle
  *   ALTER TABLE t WRITE DISTRIBUTED BY PARTITION [LOCALLY ORDERED BY …]
  *   ALTER TABLE t WRITE UNORDERED              -- clear both
  * }}}
  *
  * Each form lands as the SAME table properties the write path already
  * honors (`write.sort-order`, `write.distribution-mode`) — DDL and
  * TBLPROPERTIES converge on one write-planning code path
  * ([[GraftWriteBuilder.build]]'s RequiresDistributionAndOrdering).
  * Descending / NULLS LAST orders are refused loudly (the layout's sort
  * order dialect is ascending nulls-first). */
object GraftWriteDdl {

  private val Stmt =
    ("""(?is)^\s*ALTER\s+TABLE\s+([\w.`"]+)\s+WRITE\s+""" +
      """(UNORDERED|(?:DISTRIBUTED\s+BY\s+PARTITION\s*)?""" +
      """(?:LOCALLY\s+)?(?:ORDERED\s+BY\s+.*)?|DISTRIBUTED\s+BY\s+PARTITION)\s*;?\s*$""").r
  private val OrderBy = """(?is)\bORDERED\s+BY\s+(.*)$""".r

  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    Stmt.findFirstMatchIn(sqlText)
      .filter(_.group(2).trim.nonEmpty)
      .flatMap { m =>
        val parts = m.group(1).split('.').toSeq
          .map(_.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
        GraftViewRules.graftTarget(session, parts).map { case (g, ident) =>
          val clause = m.group(2).trim
          val upper = clause.toUpperCase.replaceAll("\\s+", " ")
          val distributed = upper.startsWith("DISTRIBUTED BY PARTITION")
          val locally = upper.contains("LOCALLY ORDERED BY")
          val unordered = upper == "UNORDERED"
          val sortCols: Seq[String] = OrderBy.findFirstMatchIn(clause)
            .map(_.group(1)).toSeq.flatMap(_.split(',')).map(_.trim)
            .filter(_.nonEmpty)
            .map { item =>
              val toks = item.split("\\s+").toSeq
              require(toks.tail.forall(t =>
                Set("ASC", "NULLS", "FIRST").contains(t.toUpperCase)),
                s"graft write DDL: only ASC NULLS FIRST orders are " +
                  s"supported, got '$item'")
              toks.head.stripPrefix("`").stripSuffix("`")
            }
          require(unordered || distributed || sortCols.nonEmpty,
            s"graft write DDL: cannot parse WRITE clause '$clause'")
          GraftWriteDdlCommand(g, ident,
            sortCols = sortCols,
            // ORDERED BY without LOCALLY implies a range distribution
            // (Iceberg's own mapping); LOCALLY = no shuffle
            distributionMode =
              if (unordered) Some("none")
              else if (distributed) Some("hash")
              else if (locally) Some("none")
              else if (sortCols.nonEmpty) Some("range")
              else None,
            clearSort = unordered)
        }
      }
}

case class GraftWriteDdlCommand(catalog: GraftCatalog, ident: Identifier,
    sortCols: Seq[String], distributionMode: Option[String],
    clearSort: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val changes = Seq.newBuilder[TableChange]
    if (clearSort) changes += TableChange.removeProperty("write.sort-order")
    else if (sortCols.nonEmpty) changes += TableChange.setProperty(
      "write.sort-order", sortCols.mkString(","))
    distributionMode.foreach(m => changes += TableChange.setProperty(
      "write.distribution-mode", m))
    catalog.alterTable(ident, changes.result(): _*)
    Nil
  }
}

case class GraftRefDdlCommand(catalog: GraftCatalog, ident: Identifier,
    op: String, kind: String, refName: String,
    ifNotExists: Boolean, ifExists: Boolean,
    asOfVersion: Option[Long], maxRefAgeMs: Option[Long],
    minSnapshotsToKeep: Option[Int], maxSnapshotAgeMs: Option[Long])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = catalog.existingTableDir(ident)
    val existing = LayoutMaintenance.refKind(spark, dir, refName)
    // a ref name means ONE thing: a CREATE/REPLACE/DROP BRANCH over a
    // ref that is actually a tag (or vice versa) refuses loudly
    existing.filter(_ != kind).foreach(k => sys.error(
      s"graft ref DDL: '$refName' on $ident is a $k, not a $kind"))
    op match {
      case "drop" =>
        if (existing.isEmpty) {
          if (!ifExists) sys.error(
            s"graft ref DDL: no $kind named '$refName' on $ident")
        } else LayoutMaintenance.dropRef(spark, dir, refName)
      case "create" if existing.isDefined =>
        if (!ifNotExists) sys.error(
          s"graft ref DDL: $kind '$refName' already exists on $ident " +
            "(use CREATE OR REPLACE or REPLACE)")
      case "replace" if existing.isEmpty =>
        sys.error(s"graft ref DDL: no $kind named '$refName' on $ident " +
          "to replace (use CREATE)")
      case _ =>
        LayoutMaintenance.setRef(spark, dir, refName, kind, asOfVersion,
          maxRefAgeMs, minSnapshotsToKeep, maxSnapshotAgeMs)
    }
    Nil
  }
}
