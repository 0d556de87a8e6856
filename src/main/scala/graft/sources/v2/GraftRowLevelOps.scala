package graft.sources.v2

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL row-level operations for the graft-iceberg connector —
  * `UPDATE … SET`, `MERGE INTO`, and non-pushable `DELETE FROM` as
  * group-based copy-on-write, the same rewrite shape Iceberg's COW mode
  * plans (spec "Copy-on-write"; reference tables are Iceberg tables, so
  * this is the write half their users run daily):
  *
  *  1. Catalyst's analyzer rewrites the command into `ReplaceData`: the
  *     table is read through [[GraftCowScan]] (this operation's scan),
  *     the surviving/updated/merged rows are computed declaratively, and
  *     written through this operation's write builder.
  *  2. The optimizer's `RowLevelOperationRuntimeGroupFiltering` sees the
  *     scan implements `SupportsRuntimeFiltering` on `_file` and plans a
  *     dynamic `IN` subquery: a FIRST pass over the plain table finds
  *     which files contain matching rows, and [[GraftCowScan.filter]]
  *     narrows the rewrite to exactly those groups — an UPDATE touching
  *     one file rewrites one file, not the table.
  *  3. The driver commit swaps the scanned files for the written ones in
  *     ONE snapshot ([[graft.sources.LayoutMaintenance.commitReplaceFiles]]).
  *
  * Group atomicity is why [[GraftCowScanBuilder]] deliberately does NOT
  * implement filter pushdown: a file whose every row matches the
  * condition must still be scanned (empty survivor set) so the commit
  * removes it — pruning it would silently resurrect its rows. At 100 TB
  * the bill is: one metadata-sized planning pass + matched-group I/O,
  * identical to Iceberg's own COW write amplification.
  */
private[v2] class GraftRowLevelOperationBuilder(table: GraftTable,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    // Iceberg's write.<command>.mode: merge-on-read plans a DELTA write
    // (position tombstones + data files, zero rewrites — GraftDeltaOps);
    // copy-on-write (the default) plans the group rewrite below
    if (table.rowLevelMode(info.command) == "merge-on-read")
      new GraftDeltaOperation(table, info.command)
    else new GraftRowLevelOperation(table, info.command)
}

private[v2] class GraftRowLevelOperation(table: GraftTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** The data files this operation's scan actually planned (post runtime
    * group filtering) — the "groups" the write commit replaces. Written
    * once by [[GraftCowScan.planInputPartitions]] on the driver before
    * any write task runs (the write reads the scan), read by the commit. */
  @volatile private[v2] var scannedFiles: Seq[String] = Nil

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCowScanBuilder(this, table)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCowWriteBuilder(this, table, info)

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftTable.FileMetadataColumn))
}

/** Column pruning only — see the group-atomicity note above for why no
  * SupportsPushDownFilters here. */
private[v2] class GraftCowScanBuilder(op: GraftRowLevelOperation,
    table: GraftTable) extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = table.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftCowScan(op, table, required)
}

private[v2] class GraftCowScan(op: GraftRowLevelOperation, table: GraftTable,
    required: StructType) extends Scan with Batch with SupportsRuntimeFiltering {

  require(!table.oversizedPlanning,
    "graft-iceberg: row-level SQL needs per-file planning; this table's " +
      "file count exceeds spark.graft.maxDriverFileEntries")

  /** Candidate groups: every data file of the current snapshot, until
    * runtime group filtering narrows them to files with matching rows. */
  @volatile private var candidates: Seq[GraftIcebergSource.FileStat] =
    table.dataFiles

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftCowScan(${op.command()}) files=${candidates.size}"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftTable.FileMetadataColumn))

  /** Runtime group filter: Spark evaluated the matching-rows subquery
    * and hands back the `_file` values that contain matches. Anything
    * other than the expected IN shape is ignored (filtering is an
    * optimization; the unfiltered rewrite is always correct). */
  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In(attr, values) if attr == GraftTable.FileMetadataColumn =>
        val keep = values.collect { case s: String => s }.toSet
        candidates = candidates.filter(f => keep(f.path))
      case _ => ()
    }

  override def planInputPartitions(): Array[InputPartition] = {
    op.scannedFiles = candidates.map(_.path)
    // MOR-aware: the COW read applies live tombstones, so rewriting a
    // merge-on-read table never resurrects deleted rows into the
    // replacement files
    candidates.map(f => table.morPartitionFor(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

private[v2] class GraftCowWriteBuilder(op: GraftRowLevelOperation,
    table: GraftTable, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftCowBatchWrite(op, table, info.schema(), info.queryId())
  }
}

/** Same task-parallel unique-file write as the append path; the commit
  * is the group swap: scanned files out, written files in, atomically. */
private[v2] class GraftCowBatchWrite(op: GraftRowLevelOperation,
    table: GraftTable, schema: StructType, queryId: String)
    extends BatchWrite {

  private val dir = table.dir

  /** The rewrite observes the SAME partition spec and stat fields as an
    * INSERT (catalog descriptor first, metadata spec positionally
    * otherwise): replacement files keep their partition values and
    * recorded column bounds, so a row-level UPDATE/DELETE never erases
    * the table's pruning ability. A spec source absent from the write
    * schema simply drops out (a rewrite must stay an optimization-
    * preserving operation, never a new failure mode). */
  private val partCols: Seq[(String, String, Int)] = {
    val named =
      if (table.writeDeclaredPartSpec.nonEmpty) table.writeDeclaredPartSpec
      else graft.sources.IcebergManifestSource
        .partitionSpec(org.apache.spark.sql.SparkSession.active, dir)
        .flatMap { case (pf, tr, srcId) =>
          if (srcId >= 1 && srcId <= schema.length)
            Some((pf, tr, schema.fields(srcId - 1).name))
          else None
        }
    named.flatMap { case (pf, tr, src) =>
      val i = schema.fieldNames.indexOf(src)
      if (i >= 0) Some((pf, tr, i)) else None
    }
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(dir,
      GraftFormatWriters.annotateLakeTypes(schema, table.lakeTypes),
      s"cow-$queryId",
      table.writeStatFields, partCols,
      // replacement files keep the table's stable field ids embedded,
      // same as an INSERT — a rewrite must not erase rename-by-id
      // resolution for the rows it carries forward
      fieldIds = GraftCatalog.fieldIdsOf(table.schema))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val added = GraftIcebergWrite.entriesOf(messages)
    // nothing matched and nothing to add: no empty snapshot (an UPDATE
    // whose WHERE hits zero groups is a no-op, like Iceberg's)
    if (op.scannedFiles.nonEmpty || added.nonEmpty)
      graft.sources.LayoutMaintenance.commitReplaceFiles(
        org.apache.spark.sql.SparkSession.active, dir,
        op.scannedFiles, added)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftIcebergWrite.deleteFiles(messages)
}
