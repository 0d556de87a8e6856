package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MERGE-ON-READ row-level SQL — Iceberg's `write.update.mode` /
  * `write.merge.mode` / `write.delete.mode` = `merge-on-read`, planned
  * through Spark's delta-write SPI ([[SupportsDelta]]):
  *
  *  1. Catalyst rewrites UPDATE/MERGE/DELETE into `WriteDelta` over this
  *     operation's scan — the table's ORDINARY batch scan (pushdown,
  *     pruning, and existing-tombstone application all apply; no group
  *     atomicity needed because nothing is rewritten), reading each
  *     row's identity through the `_file`/`_pos` metadata columns.
  *  2. Updates arrive split as DELETE + INSERT
  *     (`representUpdateAsDeleteAndInsert`): each task buffers the
  *     deleted (file, pos) pairs and streams inserted rows through the
  *     SAME partition-aware writer an INSERT uses.
  *  3. At task commit the buffered pairs become ONE position-delete
  *     parquet per task (sorted by file then position, the spec's
  *     required order); the driver commit registers data files
  *     (content=0) and tombstones (content=1) in ONE snapshot at a
  *     fresh sequence number.
  *
  * The 100 TB bill is Iceberg's own MOR bill: O(matched + inserted
  * rows) written, ZERO files rewritten — against COW's O(affected
  * files). Readers pay the anti join until `rewrite_data_files` folds
  * the tombstones away.
  */
private[v2] class GraftDeltaOperation(table: GraftTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation
    with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The table's normal scan: filters push, files skip, existing
    * tombstones apply per task — a delta write has no group atomicity
    * to preserve, so nothing about the scan is special-cased. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(table, info)

  /** Row identity: (file, ordinal) — what a position tombstone
    * addresses (Iceberg's own delta rowId) — or, under
    * `write.delete.granularity=equality`, the table's declared
    * `identifier.columns`: deletes then need only the row's KEY, the
    * Flink-style streaming-upsert dialect. */
  override def rowId(): Array[NamedReference] = {
    val eq = table.eqDeltaKeys
    if (eq.nonEmpty) eq.map(Expressions.column).toArray
    else Array(Expressions.column(GraftTable.FileMetadataColumn),
      Expressions.column(GraftTable.PosMetadataColumn))
  }

  /** UPDATE stays an UPDATE at the writer (not delete+insert): the
    * writer sees the old row's metadata alongside the new row values,
    * which is what lets it MATERIALIZE the old `_row_id` into the new
    * row version — v3 row lineage's update rule (the row keeps its id;
    * only `_last_updated_sequence_number` moves to the new commit). */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  /** The old row's lineage id, projected into the writer's `meta` row
    * so updates can carry it (null for pre-lineage files → the new row
    * reads as a fresh row, the spec's permitted fallback). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftTable.RowIdMetadataColumn))

  override def description(): String = s"GraftDelta($cmd)"
}

private[v2] class GraftDeltaWriteBuilder(table: GraftTable,
    info: LogicalWriteInfo) extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DeltaWrite {
    override def toBatch: DeltaBatchWrite =
      new GraftDeltaBatchWrite(table,
        // re-annotate lake types (the write schema loses table column
        // metadata through the DML plan)
        GraftFormatWriters.annotateLakeTypes(info.schema(),
          table.lakeTypes),
        info.queryId())
  }
}

/** Both halves of a task's delta: data files written for inserts,
  * delete files for deletes. `referenced` names the data files the
  * task's POSITION tombstones target — the commit validates they are
  * still live (Iceberg's validateDataFilesExist; a concurrent rewrite
  * would otherwise dangle the DELETE half while the inserts land).
  * `eqIds` nonEmpty marks the delete files as EQUALITY tombstones
  * (content=2) keyed by those field ids. */
private[v2] case class GraftDeltaCommitMessage(data: Seq[GraftFileInfo],
    deletes: Seq[GraftFileInfo],
    referenced: Seq[String] = Nil,
    eqIds: Seq[Int] = Nil) extends WriterCommitMessage

private[v2] class GraftDeltaBatchWrite(table: GraftTable,
    schema: StructType, queryId: String) extends DeltaBatchWrite {

  private val dir = table.dir

  /** Same spec/stat observance as an INSERT: inserted rows cluster per
    * partition value and record bounds, so MOR DML never erases the
    * table's pruning ability. */
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
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(dir, schema, queryId,
      table.writeStatFields, partCols,
      GraftCatalog.fieldIdsOf(table.schema),
      dv = table.dvTombstones,
      format = table.writeFormat,
      // identifier fields resolved against the TABLE schema (the write
      // schema of a delete-only delta carries no data columns); the ids
      // are the dialect's positional field ids, what readers resolve
      eqFields = table.eqDeltaKeys.map(k =>
        table.schema.fields.find(_.name == k).getOrElse(sys.error(
          s"graft-iceberg delta: identifier column $k not in table schema"))
          .copy(metadata = org.apache.spark.sql.types.Metadata.empty)),
      eqIds = table.eqDeltaKeys.map(k =>
        table.schema.fieldNames.indexOf(k) + 1),
      delFormat = table.deleteFileFormat)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: GraftDeltaCommitMessage => m }
    val dataEntries = msgs.flatMap(_.data).filter(_.rows > 0)
      .map(f => graft.sources.IcebergLayoutWriter.ManifestEntrySpec(
        status = 1, content = 0, filePath = f.path, recordCount = f.rows,
        sizeBytes = f.bytes, lower = f.lower, upper = f.upper,
        partition = f.partition,
        fileFormat = GraftFormatWriters.formatOf(f.path),
        valueCounts = f.valueCounts, nullValueCounts = f.nullValueCounts,
        nanValueCounts = f.nanValueCounts, columnSizes = f.columnSizes))
    val delEntries = msgs.flatMap(m => m.deletes.map(f => (f, m.eqIds)))
      .filter(_._1.rows > 0)
      .map { case (f, eqIds) =>
        graft.sources.IcebergLayoutWriter.ManifestEntrySpec(
          status = 1,
          content = if (eqIds.nonEmpty) 2 else 1,
          filePath = f.path, recordCount = f.rows,
          sizeBytes = f.bytes,
          equalityIds = eqIds,
          fileFormat =
            if (graft.sources.DeletionVectors.isDvPath(f.path)) "PUFFIN"
            else GraftFormatWriters.formatOf(f.path))
      }
    // a MERGE whose predicates hit nothing commits nothing
    if (dataEntries.nonEmpty || delEntries.nonEmpty)
      graft.sources.LayoutMaintenance.commitDeltaFiles(
        org.apache.spark.sql.SparkSession.active, dir,
        dataEntries ++ delEntries,
        referencedDataFiles = msgs.flatMap(_.referenced).distinct)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftDeltaCommitMessage => (m.data ++ m.deletes).foreach(f =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(f.path)))
      case _ => ()
    }
}

private[v2] class GraftDeltaWriterFactory(dir: String, schema: StructType,
    queryId: String, stats: Seq[GraftIcebergSource.StatField],
    partCols: Seq[(String, String, Int)],
    fieldIds: Map[String, Int], dv: Boolean,
    format: String = "parquet",
    eqFields: Seq[StructField] = Nil,
    eqIds: Seq[Int] = Nil,
    delFormat: String = "parquet") extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(dir, schema, queryId, partitionId, taskId, stats,
      partCols, fieldIds, dv, format, eqFields, eqIds, delFormat)
}

/** Task-side: inserts delegate to the ordinary partition-aware data
  * writer; deletes buffer (file, pos) — matched-rows-sized by the MOR
  * contract — and flush as one sorted position-delete parquet. */
private[v2] class GraftDeltaWriter(dir: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    stats: Seq[GraftIcebergSource.StatField],
    partCols: Seq[(String, String, Int)],
    fieldIds: Map[String, Int], dv: Boolean,
    format: String = "parquet",
    eqFields: Seq[StructField] = Nil,
    eqIds: Seq[Int] = Nil,
    /** write.delete.format.default: the POSITION-tombstone file format
      * (parquet | orc | avro; puffin rides the separate dv knob). */
    delFormat: String = "parquet")
    extends DeltaWriter[InternalRow] {

  // inserted rows honor write.format.default; the position-delete
  // files honor write.delete.format.default (delFormat above) — the
  // two knobs are independent per the Iceberg property set
  private val inserts = new GraftDataWriter(dir, schema,
    s"delta-$queryId", partitionId, taskId, stats, partCols, None, fieldIds,
    format)
  // UPDATEd row versions land in SEPARATE files that MATERIALIZE the
  // old row's `_row_id` (v3 lineage carry: the id is stable, only
  // _last_updated_sequence_number moves — it reads as the new file's
  // commit sequence). partCols indices stay valid: the lineage column
  // appends at the end.
  private lazy val updateInserts = new GraftDataWriter(dir,
    StructType(schema.fields :+
      StructField(GraftTable.RowIdMetadataColumn, LongType)),
    s"deltaup-$queryId", partitionId, taskId, stats, partCols, None,
    fieldIds, format)
  private var updatesSeen = false
  private val dels =
    scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

  // equality dialect: the rowId projection IS the key tuple — buffer
  // JVM values (the incoming InternalRow is reused between calls)
  private val eqDels =
    scala.collection.mutable.LinkedHashSet.empty[Seq[Any]]

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    if (eqFields.nonEmpty)
      eqDels += eqFields.zipWithIndex.map { case (f, i) =>
        if (id.isNullAt(i)) null
        else f.dataType match {
          case LongType => id.getLong(i)
          case org.apache.spark.sql.types.IntegerType => id.getInt(i)
          case org.apache.spark.sql.types.DoubleType => id.getDouble(i)
          case org.apache.spark.sql.types.FloatType => id.getFloat(i)
          case org.apache.spark.sql.types.BooleanType => id.getBoolean(i)
          case StringType => id.getUTF8String(i).toString
          // buffered as ByteBuffer: content-equal (the LinkedHashSet
          // dedups by value, Array[Byte] would dedup by reference)
          case org.apache.spark.sql.types.BinaryType =>
            java.nio.ByteBuffer.wrap(id.getBinary(i).clone())
          case other => sys.error(
            s"graft-iceberg delta: unsupported identifier type $other")
        }
      }
    else dels += ((id.getUTF8String(0).toString, id.getLong(1)))

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    delete(meta, id) // the old row version dies like any delete
    // the new version carries the OLD row's id (meta = the projected
    // _row_id metadata attribute; null for pre-lineage files → the new
    // row reads as fresh, the spec's fallback)
    updatesSeen = true
    val out = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(schema.length + 1)
    var i = 0
    while (i < schema.length) {
      out.update(i, if (row.isNullAt(i)) null
        else row.get(i, schema.fields(i).dataType))
      i += 1
    }
    out.update(schema.length,
      if (meta.isNullAt(0)) null else Long.box(meta.getLong(0)))
    updateInserts.write(out)
  }

  override def insert(row: InternalRow): Unit = inserts.write(row)

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    val dataFiles = (inserts.commit() match {
      case m: GraftCommitMessage => m.files
      case other => sys.error(s"unexpected insert commit message $other")
    }) ++ (if (!updatesSeen) Nil
    else updateInserts.commit() match {
      case m: GraftCommitMessage => m.files
      case other => sys.error(s"unexpected update commit message $other")
    })
    if (eqFields.nonEmpty) {
      // EQUALITY tombstones: one file of distinct key tuples per task
      // in the table's write.delete.format.default (sorted —
      // determinism, not a spec requirement for eq files),
      // equality_ids = the keys' positional field ids
      val delFiles =
        if (eqDels.isEmpty) Nil
        else {
          val w = new GraftDataWriter(dir, StructType(eqFields),
            s"deltaeq-$queryId", partitionId, taskId, format = delFormat)
          // content-stable sort key (ByteBuffer.toString is positional
          // state, not content — render binary keys as hex)
          def sortKey(t: Seq[Any]): String = t.map {
            case b: java.nio.ByteBuffer =>
              val d = b.duplicate()
              val sb = new StringBuilder(d.remaining() * 2)
              while (d.hasRemaining) sb.append(f"${d.get() & 0xff}%02x")
              sb.toString
            case v => String.valueOf(v)
          }.mkString("\u0000")
          eqDels.toSeq.sortBy(sortKey).foreach { tuple =>
            val r = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(tuple.length)
            tuple.zipWithIndex.foreach { case (v, i) =>
              r.update(i, v match {
                case s: String => UTF8String.fromString(s)
                case b: java.nio.ByteBuffer =>
                  val d = b.duplicate()
                  val out = new Array[Byte](d.remaining()); d.get(out); out
                case other => other
              })
            }
            w.write(r)
          }
          w.commit() match {
            case m: GraftCommitMessage => m.files
            case other => sys.error(s"unexpected eq commit message $other")
          }
        }
      return GraftDeltaCommitMessage(dataFiles, delFiles, eqIds = eqIds)
    }
    val delFiles =
      if (dels.isEmpty) Nil
      else if (dv) {
        // Iceberg-v3 dialect (write.delete.format=dv): ONE puffin per
        // task, one deletion-vector blob per target file. The blob's
        // snapshot-id property is 0 at task time — visibility comes
        // from the manifest entry's sequence number, which the commit
        // stamps, same as parquet tombstones.
        val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
        val f = new java.io.File(dataDir,
          s"dv-delta-$queryId-$partitionId-$taskId.puffin")
        graft.sources.DeletionVectors.write(f, 0L,
          dels.groupBy(_._1).toSeq
            .map { case (t, ps) => (t, ps.map(_._2).toSeq) })
        Seq(GraftFileInfo(f.getAbsolutePath, dels.size.toLong, f.length()))
      } else {
        val w = new GraftDataWriter(dir,
          StructType(Seq(StructField("file_path", StringType, false),
            StructField("pos", LongType, false))),
          s"deltadel-$queryId", partitionId, taskId,
          format = delFormat)
        // the spec's required tombstone order: by file, then position
        dels.sortInPlace()
        dels.foreach { case (f, p) =>
          val r = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(2)
          r.update(0, UTF8String.fromString(f))
          r.setLong(1, p)
          w.write(r)
        }
        w.commit() match {
          case m: GraftCommitMessage => m.files
          case other => sys.error(s"unexpected delete commit message $other")
        }
      }
    GraftDeltaCommitMessage(dataFiles, delFiles,
      referenced = dels.map(_._1).distinct.toSeq)
  }

  override def abort(): Unit = {
    inserts.abort()
    if (updatesSeen) updateInserts.abort()
  }

  override def close(): Unit = ()
}
