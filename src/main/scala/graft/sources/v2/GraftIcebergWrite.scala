package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** The WRITE half of the graft-iceberg connector:
  * `df.write.format("graft-iceberg").mode("append").save(tableDir)`.
  * Each task writes ONE parquet file under `data/` (parquet-hadoop
  * writer, flat primitive schemas — the layout dialect) and reports
  * (path, rows, bytes) in its commit message; the DRIVER commit turns
  * the task reports into one atomic snapshot append
  * ([[graft.sources.LayoutMaintenance.commitAppend]] — creates the
  * table metadata on first write). Task failure/retry is safe the
  * Iceberg way: files are written under unique names and only the
  * driver commit makes anything visible; `abort` deletes the orphans.
  * At 100 TB this is the standard two-phase object-store commit: data
  * moves in parallel, visibility is one metadata swap.
  */
private[v2] class GraftWriteBuilder(dir: String, info: LogicalWriteInfo,
    stats: Seq[GraftIcebergSource.StatField] = Nil,
    sortCols: Seq[String] = Nil,
    overwriteAll: Boolean = false)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite {

  /** `INSERT OVERWRITE` / `df.write.mode("overwrite")` — full-table
    * replacement only (the unpartitioned static-overwrite shape): the
    * commit swaps every current data file for the written ones in ONE
    * snapshot via the same group-replace primitive row-level SQL uses.
    * Filtered overwrite shapes are refused in canOverwrite (fail the
    * statement, never half-replace). */
  override def canOverwrite(filters: Array[org.apache.spark.sql.sources.Filter])
      : Boolean =
    filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])

  override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
      : WriteBuilder = {
    require(canOverwrite(filters),
      s"graft-iceberg: only full-table overwrite is supported, got " +
        filters.mkString(", "))
    new GraftWriteBuilder(dir, info, stats, sortCols, overwriteAll = true)
  }

  override def truncate(): WriteBuilder =
    new GraftWriteBuilder(dir, info, stats, sortCols, overwriteAll = true)

  private trait GraftWrite extends Write {
    override def toBatch: BatchWrite =
      if (overwriteAll)
        new GraftOverwriteBatchWrite(dir, info.schema(), info.queryId(), stats)
      else new GraftBatchWrite(dir, info.schema(), info.queryId(), stats)
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new GraftStreamingWrite(dir, info.schema(), info.queryId(), stats)
  }

  /** `write.sort-order` asks the PLANNER for a range distribution plus a
    * per-partition sort on those columns (Iceberg's range write-
    * distribution mode): tasks then write globally range-clustered files
    * whose recorded bounds are DISJOINT — exactly what manifest-bound
    * file skipping wants. Without the property the write is
    * distribution-free, as before. (Batch path; a streaming sink with a
    * sort order fails Spark's own global-sort check — set it on batch
    * tables.) */
  override def build(): Write =
    if (sortCols.isEmpty) new GraftWrite {}
    else new GraftWrite with RequiresDistributionAndOrdering {
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
      private val order = sortCols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
      override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution =
        org.apache.spark.sql.connector.distributions.Distributions.ordered(order)
      override def requiredOrdering()
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] = order
    }
}

/** Full-table overwrite: task-parallel unique-file writes, then one
  * snapshot that drops every pre-commit data file and adds the new set.
  * A table that was never written truncates to a plain first append. */
private[v2] class GraftOverwriteBatchWrite(dir: String, schema: StructType,
    queryId: String,
    stats: Seq[GraftIcebergSource.StatField] = Nil) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(dir, schema, s"ow-$queryId", stats)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val added = messages.collect {
      case m: GraftCommitMessage if m.rows > 0 =>
        graft.sources.IcebergLayoutWriter.ManifestEntrySpec(status = 1,
          content = 0, filePath = m.path, recordCount = m.rows,
          sizeBytes = m.bytes, lower = m.lower, upper = m.upper)
    }
    val m = new java.io.File(dir, "metadata")
    val hasMeta = new java.io.File(m, "version-hint.text").exists() ||
      Option(m.listFiles()).exists(_.exists(_.getName.endsWith(".metadata.json")))
    if (!hasMeta) {
      // overwrite of a never-written table == its first append
      if (added.nonEmpty)
        graft.sources.LayoutMaintenance.commitAppend(spark, dir, added.toSeq)
    } else {
      val current = graft.sources.IcebergManifestSource
        .statsFromTableDir(spark, dir, "t", Nil)
        .select("file_path").collect().map(_.getString(0)).toSeq
      graft.sources.LayoutMaintenance.commitReplaceFiles(
        spark, dir, current, added.toSeq, dropDeletes = true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftCommitMessage =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(m.path))
      case _ => ()
    }
}

/** `writeStream.format("graft-iceberg")` without foreachBatch: each
  * epoch's task files commit as ONE snapshot append — the same two-phase
  * object-store shape as the batch write, once per trigger. Exactly-once
  * across restarts is the standard epoch-ledger discipline: the commit
  * is keyed by (queryId, epochId) in `metadata/streaming-epochs.json`;
  * a replayed epoch (post-crash re-run of a trigger whose commit already
  * landed) deletes its re-written files and commits nothing, so the
  * table never double-counts. The ledger is read-modify-written under
  * the same per-table lock (and CREATE_NEW version CAS) every other
  * commit path uses. At 100 TB the steady-state bill per trigger is the
  * append rate: task-parallel data files + one metadata swap. */
private[v2] class GraftStreamingWrite(dir: String, schema: StructType,
    queryId: String,
    stats: Seq[GraftIcebergSource.StatField] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new GraftStreamingWriterFactory(dir, schema, queryId, stats)

  private def ledgerFile =
    new java.io.File(new java.io.File(dir, "metadata"), "streaming-epochs.json")

  private def lastCommitted(): Long = {
    val f = ledgerFile
    if (!f.exists()) return -1L
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    Option(root.get(queryId)).filter(_.canConvertToLong)
      .map(_.asLong()).getOrElse(-1L)
  }

  private def recordCommitted(epochId: Long): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val f = ledgerFile
    val root =
      if (f.exists())
        mapper.readTree(f).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else mapper.createObjectNode()
    root.put(queryId, epochId)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    graft.sources.LayoutMaintenance.commitLock(dir).synchronized {
      if (epochId <= lastCommitted()) {
        // replayed trigger: the snapshot already landed — drop the rerun's
        // files instead of double-committing them
        abort(epochId, messages)
      } else {
        val entries = messages.collect {
          case m: GraftCommitMessage if m.rows > 0 =>
            graft.sources.IcebergLayoutWriter.ManifestEntrySpec(status = 1,
              content = 0, filePath = m.path, recordCount = m.rows,
              sizeBytes = m.bytes, lower = m.lower, upper = m.upper)
        }
        if (entries.nonEmpty)
          graft.sources.LayoutMaintenance.commitAppend(
            org.apache.spark.sql.SparkSession.active, dir, entries.toSeq)
        // empty epochs advance the ledger too: their replay is also a no-op
        recordCommitted(epochId)
      }
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftCommitMessage =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(m.path))
      case _ => ()
    }
}

private[v2] class GraftStreamingWriterFactory(dir: String, schema: StructType,
    queryId: String,
    stats: Seq[GraftIcebergSource.StatField] = Nil)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir, schema, s"$queryId-e$epochId", partitionId, taskId,
      stats)
}

private[v2] case class GraftCommitMessage(path: String, rows: Long,
    bytes: Long, lower: Map[Int, Array[Byte]] = Map.empty,
    upper: Map[Int, Array[Byte]] = Map.empty) extends WriterCommitMessage

private[v2] class GraftBatchWrite(dir: String, schema: StructType,
    queryId: String,
    stats: Seq[GraftIcebergSource.StatField] = Nil) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(dir, schema, queryId, stats)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.collect {
      case m: GraftCommitMessage if m.rows > 0 =>
        graft.sources.IcebergLayoutWriter.ManifestEntrySpec(status = 1,
          content = 0, filePath = m.path, recordCount = m.rows,
          sizeBytes = m.bytes, lower = m.lower, upper = m.upper)
    }
    // empty-task files were already deleted task-side; an all-empty
    // write still commits an (empty) snapshot? No: real engines skip it
    if (entries.nonEmpty)
      graft.sources.LayoutMaintenance.commitAppend(
        org.apache.spark.sql.SparkSession.active, dir, entries.toSeq)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: GraftCommitMessage =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(m.path))
      case _ => ()
    }
}

private[v2] class GraftWriterFactory(dir: String, schema: StructType,
    queryId: String,
    stats: Seq[GraftIcebergSource.StatField] = Nil) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir, schema, queryId, partitionId, taskId, stats)
}

private[v2] class GraftDataWriter(dir: String, schema: StructType,
    queryId: String, partitionId: Int, taskId: Long,
    stats: Seq[GraftIcebergSource.StatField] = Nil)
    extends DataWriter[InternalRow] {

  // Per-file column statistics for the declared stat fields (the same
  // name:fieldId:type contract the read path prunes on): min/max over
  // non-null values, encoded per Iceberg Appendix D at commit. A real
  // writer records these so ITS OWN files skip on later reads.
  private val statIdx: Array[(Int, GraftIcebergSource.StatField)] =
    stats.flatMap(f => schema.fieldNames.indexOf(f.name) match {
      case -1 => None
      case i => Some((i, f))
    }).toArray
  private val statMin = new Array[Any](statIdx.length)
  private val statMax = new Array[Any](statIdx.length)

  private val file = {
    val dataDir = new java.io.File(dir, "data"); dataDir.mkdirs()
    new java.io.File(dataDir,
      s"append-$queryId-$partitionId-$taskId.parquet")
  }

  private val msgType = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "optional int64"
        case IntegerType => "optional int32"
        case DoubleType => "optional double"
        case FloatType => "optional float"
        case BooleanType => "optional boolean"
        case StringType => "optional binary"
        case other => sys.error(s"graft-iceberg write: unsupported type $other")
      }
      s"  $t ${f.name}" +
        (if (f.dataType == StringType) " (UTF8);" else ";")
    }.mkString("\n")
    MessageTypeParser.parseMessageType(s"message row {\n$fields\n}")
  }

  private val writer: ParquetWriter[org.apache.parquet.example.data.Group] = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(msgType, conf)
    ExampleParquetWriter.builder(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath))
      .withConf(conf)
      .build()
  }

  private val factory = new SimpleGroupFactory(msgType)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i)) {
        val f = schema.fields(i)
        f.dataType match {
          case LongType => g.add(f.name, record.getLong(i))
          case IntegerType => g.add(f.name, record.getInt(i))
          case DoubleType => g.add(f.name, record.getDouble(i))
          case FloatType => g.add(f.name, record.getFloat(i))
          case BooleanType => g.add(f.name, record.getBoolean(i))
          case StringType => g.add(f.name, record.getUTF8String(i).toString)
          case other => sys.error(s"graft-iceberg write: unsupported type $other")
        }
      }
      i += 1
    }
    writer.write(g)
    var j = 0
    while (j < statIdx.length) {
      val (i, _) = statIdx(j)
      if (!record.isNullAt(i)) {
        val v: Any = schema.fields(i).dataType match {
          case LongType => record.getLong(i)
          case IntegerType => record.getInt(i).toLong
          case DoubleType => record.getDouble(i)
          case FloatType => record.getFloat(i).toDouble
          case StringType => record.getUTF8String(i).toString
          case _ => null
        }
        if (v != null) {
          def lt(a: Any, b: Any): Boolean = (a, b) match {
            case (x: Long, y: Long) => x < y
            case (x: Double, y: Double) => x < y
            case (x: String, y: String) => x < y
            case _ => false
          }
          if (statMin(j) == null || lt(v, statMin(j))) statMin(j) = v
          if (statMax(j) == null || lt(statMax(j), v)) statMax(j) = v
        }
      }
      j += 1
    }
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (rows == 0) { // nothing to add: don't leave an empty file behind
      org.apache.commons.io.FileUtils.deleteQuietly(file)
      GraftCommitMessage(file.getAbsolutePath, 0L, 0L)
    } else {
      // bounds per declared stat field, Iceberg Appendix-D encodings —
      // all-null columns carry no bound (the reader keeps such files)
      import graft.sources.IcebergLayoutWriter.{boundLong, boundDouble, boundString}
      def enc(v: Any): Array[Byte] = v match {
        case x: Long => boundLong(x)
        case x: Double => boundDouble(x)
        case x: String => boundString(x)
      }
      val lower = statIdx.indices.flatMap { j =>
        Option(statMin(j)).map(v => statIdx(j)._2.fieldId -> enc(v)) }.toMap
      val upper = statIdx.indices.flatMap { j =>
        Option(statMax(j)).map(v => statIdx(j)._2.fieldId -> enc(v)) }.toMap
      GraftCommitMessage(file.getAbsolutePath, rows, file.length(), lower, upper)
    }
  }

  override def abort(): Unit = {
    writer.close()
    org.apache.commons.io.FileUtils.deleteQuietly(file)
  }

  override def close(): Unit = ()
}
