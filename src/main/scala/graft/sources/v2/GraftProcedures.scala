package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{IcebergManifestSource, LayoutMaintenance, MetadataTables, OrphanFiles}

/** SQL maintenance procedures — Spark 4's `ProcedureCatalog` surface over
  * the executed [[graft.sources.LayoutMaintenance]] operations, mirroring
  * Iceberg's own `CALL catalog.system.<proc>(...)` names:
  *
  * {{{
  *   CALL graft.system.rollback_to_snapshot(table => 'db.t', snapshot_id => 3)
  *   CALL graft.system.expire_snapshots('db.t', retain_last => 2)
  *   CALL graft.system.rewrite_data_files('db.t')
  *   CALL graft.system.fast_forward('db.t', 'main', 'audit-branch')
  *   CALL graft.system.remove_orphan_files('db.t', dry_run => false)
  * }}}
  *
  * The reference exposes compaction only as a SIMULATION inside its metric
  * report (`/root/reference/icebergdiag/metrics/table_metrics.py:128-155`);
  * the Spark-native expression of "act on the diagnosis" is the engine's
  * executed maintenance commits made identifier-addressable through the
  * same catalog that serves the tables. Each procedure returns one
  * driver-local summary relation ([[LocalScan]] — Spark's `InvokeProcedures`
  * converts only local scans, and maintenance summaries are commit-sized,
  * so no executor tasks are spent on the result). The underlying ops do
  * their data movement through the same distributed read/write paths as the
  * connector: nothing here adds a driver-side data path.
  *
  * Argument binding (names, defaults, coercion) is Spark's: parameters are
  * declared with [[ProcedureParameter]] and the analyzer reorders named
  * args and fills declared defaults before `call` sees one [[InternalRow]].
  */
object GraftProcedures {

  /** Procedure-call results are metadata-sized; serve them driver-local. */
  private final class ResultScan(schema0: StructType, data: Seq[Seq[Any]],
      describe: String) extends LocalScan {
    override def readSchema(): StructType = schema0
    override def rows(): Array[InternalRow] =
      data.map(vs => InternalRow.fromSeq(vs.map {
        case s: String => UTF8String.fromString(s)
        case other => other
      })).toArray
    override def description(): String = describe
  }

  private abstract class Proc(
      procName: String,
      val params: Array[ProcedureParameter],
      val resultSchema: StructType,
      describe: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = describe
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    final override def call(input: InternalRow): util.Iterator[Scan] =
      util.Collections.singletonList[Scan](new ResultScan(resultSchema,
        run(SparkSession.active, input), s"graft_procedure($procName)"))
        .iterator()
    def run(spark: SparkSession, input: InternalRow): Seq[Seq[Any]]
  }

  private def p(name: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(name, t).build()
  private def pd(name: String, t: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, t).defaultValue(default).build()

  /** All procedures, keyed by name. `resolve` maps the `table` argument
    * (a catalog-relative `db.t` identifier string) to the layout dir. */
  def all(resolve: String => String): Map[String, UnboundProcedure] = Seq(

    new Proc("rollback_to_snapshot",
      Array(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType, nullable = false))),
      "Move the table head (and main) back to a historic snapshot") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val target = in.getLong(1)
        val prev = LayoutMaintenance.rollback(spark, dir, target)
        Seq(Seq(prev.map(Long.box).orNull, target))
      }
    },

    new Proc("set_current_snapshot",
      Array(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("previous_snapshot_id", LongType),
        StructField("current_snapshot_id", LongType, nullable = false))),
      "Set the current snapshot pointer to any snapshot in history " +
        "(Iceberg's set_current_snapshot; same pointer move as rollback)") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val target = in.getLong(1)
        val prev = LayoutMaintenance.rollback(spark, dir, target)
        Seq(Seq(prev.map(Long.box).orNull, target))
      }
    },

    new Proc("expire_snapshots",
      Array(p("table", StringType), pd("retain_last", IntegerType, "1")),
      StructType(Seq(
        StructField("kept_snapshots_count", IntegerType, nullable = false),
        StructField("deleted_metadata_files_count", IntegerType, nullable = false))),
      "Expire history older than the newest retain_last snapshots " +
        "(the current snapshot is never expired)") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val (kept, deleted) =
          LayoutMaintenance.expireSnapshots(spark, dir, in.getInt(1))
        Seq(Seq(kept.size, deleted))
      }
    },

    new Proc("rewrite_data_files",
      Array(p("table", StringType), pd("sort_by", StringType, "''")),
      StructType(Seq(
        StructField("new_snapshot_id", LongType, nullable = false),
        StructField("rewritten_rows", LongType, nullable = false),
        StructField("files_before", IntegerType, nullable = false),
        StructField("files_after", IntegerType, nullable = false))),
      "Rewrite the MOR state fresh: tombstones applied and dropped, data " +
        "re-laid-out (optionally sorted by the comma-separated sort_by cols); " +
        "equality keys resolve from manifest equality_ids") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val sortCols = in.getUTF8String(1).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val (snap, rows, before, after) =
          LayoutMaintenance.rewriteDataFiles(spark, dir, Nil, sortCols)
        // Seq[Any] with explicit boxing — a plain Seq(long, int, …) would
        // numeric-widen the ints to Long and break the declared Int schema
        Seq(Seq[Any](Long.box(snap), Long.box(rows),
          Int.box(before), Int.box(after)))
      }
    },

    new Proc("rewrite_position_deletes",
      Array(p("table", StringType)),
      StructType(Seq(
        StructField("new_snapshot_id", LongType, nullable = false),
        StructField("delete_files_before", IntegerType, nullable = false),
        StructField("delete_files_after", IntegerType, nullable = false),
        StructField("live_pairs", LongType, nullable = false))),
      "Consolidate position-delete files: dead pairs dropped, live pairs " +
        "re-committed as one file") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val (snap, before, after, pairs) =
          LayoutMaintenance.rewritePositionDeletes(spark, dir)
        Seq(Seq[Any](Long.box(snap), Int.box(before), Int.box(after),
          Long.box(pairs.toLong)))
      }
    },

    new Proc("rewrite_manifests",
      Array(p("table", StringType)),
      StructType(Seq(
        StructField("manifests_before", IntegerType, nullable = false),
        StructField("manifests_after", IntegerType, nullable = false))),
      "Consolidate the current snapshot's manifests into one") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val (before, after) = LayoutMaintenance.rewriteManifests(spark, dir)
        Seq(Seq(before, after))
      }
    },

    new Proc("cherrypick_snapshot",
      Array(p("table", StringType), p("snapshot_id", LongType)),
      StructType(Seq(
        StructField("source_snapshot_id", LongType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false))),
      "Re-commit a staged append snapshot's additions onto the current " +
        "head (the WAP publish path when the base has advanced)") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val picked = in.getLong(1)
        val newHead = LayoutMaintenance.cherryPick(spark, dir, picked)
        Seq(Seq(picked, newHead))
      }
    },

    new Proc("fast_forward",
      Array(p("table", StringType), p("branch", StringType), p("to", StringType)),
      StructType(Seq(
        StructField("branch_updated", StringType, nullable = false),
        StructField("current_snapshot_id", LongType, nullable = false))),
      "Fast-forward `branch` to the head of ref `to` (publishes a staged " +
        "WAP branch when branch = 'main')") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val branch = in.getUTF8String(1).toString
        val source = in.getUTF8String(2).toString
        val snap = LayoutMaintenance.fastForward(spark, dir, from = source,
          to = branch)
        Seq(Seq(branch, snap))
      }
    },

    new Proc("remove_orphan_files",
      Array(p("table", StringType), pd("dry_run", BooleanType, "true")),
      StructType(Seq(
        StructField("orphan_file_location", StringType, nullable = false),
        StructField("deleted", BooleanType, nullable = false))),
      "List (dry_run, the default) or delete files under the table's data " +
        "dir referenced by NO snapshot in history") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        import org.apache.spark.sql.functions.col
        import spark.implicits._
        val dir = resolve(in.getUTF8String(0).toString)
        val dryRun = in.getBoolean(1)
        val dataDir = new java.io.File(dir, "data")
        if (!dataDir.isDirectory) return Nil
        // every snapshot's entries stay referenced — orphan removal must
        // never break time travel, so the live set is the UNION over history
        val snapIds = MetadataTables.snapshots(spark, dir)
          .select("snapshot_id").collect().map(_.getLong(0)).toSeq
        val referenced = snapIds
          .map(id => IcebergManifestSource
            .statsFromTableDir(spark, dir, "t", Nil, snapshotId = Some(id))
            .select(col("file_path")).as[String])
          .reduceOption(_ union _)
          .getOrElse(spark.emptyDataset[String])
          .distinct()
        val orphans = OrphanFiles
          .find(spark, dataDir.getAbsolutePath, referenced)
          .collect().sorted.toSeq
        if (!dryRun) orphans.foreach(p => new java.io.File(p).delete())
        orphans.map(p => Seq(p, !dryRun))
      }
    },

    new Proc("ancestors_of",
      Array(p("table", StringType)),
      StructType(Seq(
        StructField("snapshot_id", LongType, nullable = false),
        StructField("committed_at_ms", LongType),
        StructField("is_current", BooleanType, nullable = false))),
      "Snapshot history oldest-first, with the current head marked") {
      def run(spark: SparkSession, in: InternalRow): Seq[Seq[Any]] = {
        val dir = resolve(in.getUTF8String(0).toString)
        val cur = LayoutMaintenance.currentSnapshot(spark, dir)
        LayoutMaintenance.snapshotTimestamps(spark, dir)
          .map { case (id, ts) =>
            Seq(id, ts.map(Long.box).orNull, cur.contains(id)) }
      }
    }

  ).map(proc => proc.name() -> (proc: UnboundProcedure)).toMap
}
