package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Distributed reader for AVRO data files — the third data-file format
  * the Iceberg spec admits per manifest entry (`file_format`: PARQUET,
  * ORC, or AVRO). This Spark distribution ships no avro DataSource, so
  * the scan is hand-rolled on the avro-core library (on Spark's own
  * classpath — manifests are avro too): one task per file, each task
  * streams the container's blocks with `DataFileReader` and stamps
  * `pos` from its own read order — an avro container is a strictly
  * sequential format, so the row ordinal IS the iteration index, and
  * every avro row carries a REAL position (position tombstones apply
  * with no special routing, unlike ORC's two-arm split in [[MorRead]]).
  *
  * Parallelism: BLOCK-GRANULAR, like ORC stripes — the driver reads
  * each container's block directory from the block HEADERS alone
  * ([[blockLayout]]: two varints per block, payloads skipped),
  * prefix-sums row counts into absolute ordinals, and fans consecutive
  * blocks out as sync-seek tasks, so a single huge avro file
  * parallelizes instead of serializing on one task. Past a handful of
  * files the directory reads themselves go out as one small Spark job.
  */
object AvroDataRead {

  /** Spark type for an avro field schema: scalars + the two logical
    * types this layout's writer emits (date, timestamp-micros), with
    * `["null", T]` unions unwrapped to nullable T. */
  private[sources] def sparkType(s: Schema): DataType = {
    import Schema.Type._
    s.getType match {
      case UNION =>
        val branches = s.getTypes
        val nonNull = (0 until branches.size).map(branches.get)
          .filterNot(_.getType == NULL)
        require(nonNull.size == 1,
          s"AvroDataRead: only ['null', T] unions are supported, got $s")
        sparkType(nonNull.head)
      case INT if logical(s) == "date" => DateType
      case INT => IntegerType
      case LONG if logical(s) == "timestamp-micros" => TimestampType
      case LONG if logical(s) == "local-timestamp-micros" => TimestampNTZType
      case LONG => LongType
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case BOOLEAN => BooleanType
      case STRING => StringType
      case BYTES | FIXED if logical(s) == "decimal" =>
        val d = s.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      // uuid lake columns (fixed(16) + logicalType uuid) surface as
      // STRING (the Spark-side type); plain fixed(L) as BINARY
      case FIXED if "uuid" == s.getObjectProp("logicalType") => StringType
      case FIXED => BinaryType
      case BYTES => BinaryType
      case RECORD =>
        // record-in-record, any depth
        import scala.jdk.CollectionConverters._
        StructType(s.getFields.asScala.toSeq.map { f =>
          StructField(f.name, sparkType(f.schema()), nullable = true)
        })
      case ARRAY if isKvMap(s) =>
        val kv = s.getElementType.getFields
        MapType(sparkType(kv.get(0).schema()), sparkType(kv.get(1).schema()))
      case ARRAY => ArrayType(sparkType(s.getElementType))
      case MAP => MapType(StringType, sparkType(s.getValueType))
      case other => sys.error(
        s"AvroDataRead: unsupported avro type $other — data files in " +
          "this layout carry scalar/record/array/map schemas")
    }
  }

  /** A `["null", T]` union's T; any other schema unchanged. */
  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else (0 until s.getTypes.size).map(s.getTypes.get)
      .filterNot(_.getType == Schema.Type.NULL).head

  /** The Iceberg Avro appendix's non-string-key MAP encoding — the
    * shared detector, so this arm and the connector's row reader can
    * never disagree on the same file. */
  private def isKvMap(s: Schema): Boolean =
    graft.sources.v2.GraftFormatReaders.isAvroKvMap(s)

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  /** Type-specialized converter (avro runtime value → Spark external
    * Row value), built ONCE per field per task — the per-VALUE work is
    * one closure call, no per-value type dispatch. */
  private def converterOf(s: Schema): Any => Any = {
    import Schema.Type._
    s.getType match {
      case UNION => converterOf(unwrap(s))
      case INT if logical(s) == "date" => v =>
        if (v == null) null
        else java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case LONG if logical(s) == "timestamp-micros" => v =>
        if (v == null) null
        else {
          val us = v.asInstanceOf[Long]
          val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt); ts
        }
      case LONG if logical(s) == "local-timestamp-micros" => v =>
        if (v == null) null
        else { // external NTZ encoding: LocalDateTime
          val us = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        }
      case STRING => v => if (v == null) null else v.toString // Utf8
      case BYTES if logical(s) == "decimal" =>
        val scale = s.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        v =>
          if (v == null) null
          else {
            val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
            val out = new Array[Byte](bb.remaining()); bb.get(out)
            new java.math.BigDecimal(new java.math.BigInteger(out), scale)
          }
      case BYTES => v =>
        if (v == null) null
        else {
          val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
          val out = new Array[Byte](bb.remaining()); bb.get(out); out
        }
      // wide decimals: the spec's `fixed` of sign-extended unscaled bytes
      case FIXED if logical(s) == "decimal" =>
        val scale = s.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        v =>
          if (v == null) null
          else new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()),
            scale)
      // uuid fixed(16) → canonical string; plain fixed(L) → bytes
      case FIXED =>
        val isUuid = "uuid" == s.getObjectProp("logicalType")
        v =>
          if (v == null) null
          else {
            val b = v.asInstanceOf[org.apache.avro.generic.GenericFixed]
              .bytes()
            if (isUuid)
              graft.sources.v2.GraftFormatWriters.uuidString(b)
            else b
          }
      case RECORD =>
        import scala.jdk.CollectionConverters._
        val kids = s.getFields.asScala.toArray.map(f => converterOf(f.schema()))
        v =>
          if (v == null) null
          else {
            val rec = v.asInstanceOf[GenericRecord]
            val vals = new Array[Any](kids.length)
            var c = 0
            while (c < kids.length) { vals(c) = kids(c)(rec.get(c)); c += 1 }
            new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
          }
      case ARRAY if isKvMap(s) =>
        // non-string-key map: key/value records into the external
        // scala Map encoding
        val kvFields = s.getElementType.getFields
        val kConv = converterOf(kvFields.get(0).schema())
        val vConv = converterOf(kvFields.get(1).schema())
        v =>
          if (v == null) null
          else {
            val coll = v.asInstanceOf[java.util.Collection[_]]
            val b = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
            val it = coll.iterator()
            while (it.hasNext) {
              val rec = it.next().asInstanceOf[GenericRecord]
              b.put(kConv(rec.get(0)), vConv(rec.get(1)))
            }
            b.toMap
          }
      case ARRAY =>
        // array: elements into the external Seq encoding, recursive
        val elem = converterOf(s.getElementType)
        v =>
          if (v == null) null
          else {
            val coll = v.asInstanceOf[java.util.Collection[_]]
            val vals = new Array[Any](coll.size)
            val it = coll.iterator()
            var c = 0
            while (it.hasNext) { vals(c) = elem(it.next()); c += 1 }
            vals.toSeq
          }
      case MAP =>
        // string-key map: avro Utf8 keys into the external scala Map
        val vConv = converterOf(s.getValueType)
        v =>
          if (v == null) null
          else {
            val m = v.asInstanceOf[java.util.Map[_, _]]
            val b = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              b.put(e.getKey.toString, vConv(e.getValue))
            }
            b.toMap
          }
      case _ => identity
    }
  }

  /** (target file_path, pos) pairs of one AVRO position-tombstone file
    * (`write.delete.format.default = avro`) — executor-side, sequential,
    * the avro twin of the parquet tombstone read. */
  def readPosDeletes(path: String): Seq[(String, Long)] = {
    val r = new DataFileReader[GenericRecord](new java.io.File(path),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[(String, Long)]
      while (r.hasNext) {
        val rec = r.next()
        out += ((String.valueOf(rec.get("file_path")),
          rec.get("pos").asInstanceOf[Long]))
      }
      out.result()
    } finally r.close()
  }

  /** One container's block layout — (syncPointOffset, rowsInBlock) per
    * block — read from the BLOCK HEADERS ALONE: each block is
    * `[zigzag-varint rowCount][zigzag-varint byteSize][payload][16-byte
    * sync]` (Avro spec "Object Container Files"), so the driver reads
    * two varints per block and SKIPS the payload — bytes proportional
    * to block count, the avro twin of ORC's stripe-directory tail read.
    * The offsets are valid `DataFileReader.seek` targets (positions
    * just past a sync marker, where a block starts). */
  def blockLayout(path: String): Seq[(Long, Long)] = {
    val headerEnd = {
      val r = new DataFileReader[GenericRecord](new java.io.File(path),
        new GenericDatumReader[GenericRecord]())
      try r.previousSync() finally r.close()
    }
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(path)))
    try {
      var skipped = 0L
      while (skipped < headerEnd) {
        val s = in.skip(headerEnd - skipped)
        require(s > 0, s"AvroDataRead: cannot skip container header of $path")
        skipped += s
      }
      // zigzag varint (Avro's long encoding) — two per block header
      def readVarLong(): Long = {
        var b = in.read()
        if (b < 0) return -1L // EOF: no more blocks
        var n: Long = (b & 0x7f).toLong; var shift = 7
        while ((b & 0x80) != 0) {
          b = in.read()
          require(b >= 0, s"AvroDataRead: truncated block header in $path")
          n |= (b & 0x7f).toLong << shift; shift += 7
        }
        (n >>> 1) ^ -(n & 1L) // zigzag decode
      }
      val out = Seq.newBuilder[(Long, Long)]
      var offset = headerEnd
      var rows = readVarLong()
      while (rows >= 0) {
        val bytes = readVarLong()
        require(bytes >= 0, s"AvroDataRead: truncated block in $path")
        out += ((offset, rows))
        var toSkip = bytes + 16 // payload + sync marker
        while (toSkip > 0) {
          val s = in.skip(toSkip)
          require(s > 0, s"AvroDataRead: truncated block payload in $path")
          toSkip -= s
        }
        offset += varLen(rows) + varLen(bytes) + bytes + 16
        rows = readVarLong()
      }
      out.result()
    } finally in.close()
  }

  /** Encoded byte length of a zigzag varint — block offsets advance by
    * header + payload + sync. */
  private def varLen(v: Long): Long = {
    var n = (v << 1) ^ (v >> 63); var len = 1L
    while ((n & ~0x7fL) != 0) { n >>>= 7; len += 1 }
    len
  }

  /** Read `paths` (absolute, scheme-normalized local/Hadoop paths) with
    * columns `<data columns> + file_path(string) + pos(long)`. All
    * files must share one record schema (one table's manifest entries).
    *
    * Parallelism: BLOCK-GRANULAR — the driver reads each container's
    * block directory ([[blockLayout]], bytes-per-block I/O), prefix-sums
    * row counts into absolute starting ordinals, and packs consecutive
    * blocks into ~`targetBlocksPerTask` tasks. Each task
    * `DataFileReader.sync`-seeks to its first block and reads exactly
    * its row budget, stamping `pos = taskBase + i` — ordinals identical
    * to a sequential read by construction (pinned by AvroDataReadSpec's
    * multi-block round-trip). A single huge avro file now parallelizes
    * like ORC stripes instead of serializing on one task. */
  def readWithPos(spark: SparkSession, paths: Seq[String],
      targetBlocksPerTask: Int = 16): DataFrame = {
    require(paths.nonEmpty, "AvroDataRead.readWithPos: empty file list")
    // driver: container headers only — schema agreement
    val schemas = paths.map { p =>
      val r = new DataFileReader[GenericRecord](new java.io.File(p),
        new GenericDatumReader[GenericRecord]())
      try (p, r.getSchema.toString) finally r.close()
    }
    // schema GENERATIONS (pre/post rename or ADD COLUMN files): one
    // read per generation, merged by name with missing columns
    // null-filled — the caller's alias fold collapses renamed
    // generations downstream
    val byGen = schemas.groupBy(_._2).toSeq.sortBy(_._1)
    if (byGen.size > 1)
      return byGen.map { case (_, files) =>
        readWithPos(spark, files.map(_._1), targetBlocksPerTask)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    val schemaStr = schemas.head._2
    val avro = new Schema.Parser().parse(schemaStr)
    require(avro.getType == Schema.Type.RECORD,
      s"AvroDataRead: data files must hold records, got ${avro.getType}")
    import scala.jdk.CollectionConverters._
    val fields = avro.getFields.asScala.toSeq
    val sparkSchema = StructType(
      fields.map(f => StructField(f.name, sparkType(f.schema()),
        nullable = true)) ++
        Seq(StructField("file_path", StringType, nullable = false),
          StructField("pos", LongType, nullable = false)))
    // block directories: a serial driver loop up to a handful of files,
    // ONE small Spark job past it (each task reads varint headers only) —
    // the same planning-tail distribution OrcPosRead's stripe reads use
    val layouts: Seq[(String, Seq[(Long, Long)])] =
      if (paths.size <= 8) paths.map(p => (p, blockLayout(p)))
      else {
        val n = math.max(1, math.min(paths.size,
          spark.sparkContext.defaultParallelism))
        val byPath = spark.sparkContext.parallelize(paths, n)
          .map(p => (p, blockLayout(p))).collect().toMap
        paths.map(p => (p, byPath(p)))
      }
    // (path, seekOffset, baseOrdinal, rowBudget) — consecutive blocks
    // packed per task, absolute ordinals from the prefix sums
    val tasks: Seq[(String, Long, Long, Long)] = layouts.flatMap {
      case (p, blocks) =>
        if (blocks.isEmpty) Nil
        else {
          val grouped = blocks.grouped(math.max(1, targetBlocksPerTask)).toSeq
          var base = 0L
          grouped.map { g =>
            val t = (p, g.head._1, base, g.map(_._2).sum)
            base += g.map(_._2).sum
            t
          }
        }
    }
    val n = math.max(1, math.min(tasks.size,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(tasks, n).flatMap {
      case (path, offset, base, budget) =>
        val reader = new DataFileReader[GenericRecord](
          new java.io.File(path), new GenericDatumReader[GenericRecord]())
        reader.seek(offset)
        // one specialized converter per field for the whole task, and
        // ONE reused GenericRecord (DataFileReader.next(reuse)) — the
        // decode allocates values, never a fresh record per row
        val conv = reader.getSchema.getFields.asScala.toArray
          .map(f => converterOf(f.schema()))
        val nCols = conv.length
        var reuse: GenericRecord = null
        // close with the TASK: a LIMIT-terminated or failed task abandons
        // the iterator mid-stream and exhaustion-close alone would leak
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        new Iterator[Row] {
          private var i = 0L
          override def hasNext: Boolean = i < budget && reader.hasNext
          override def next(): Row = {
            reuse = reader.next(reuse)
            val vals = new Array[Any](nCols + 2)
            var c = 0
            while (c < nCols) { vals(c) = conv(c)(reuse.get(c)); c += 1 }
            vals(nCols) = path
            vals(nCols + 1) = base + i
            i += 1
            new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
          }
        }
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
