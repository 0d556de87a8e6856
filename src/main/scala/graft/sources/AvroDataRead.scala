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
  * Parallelism note: tasks are file-granular where the parquet/ORC
  * scans split inside files. Avro data files in this layout are
  * append-commit sized (one file per [[IcebergLayoutWriter
  * .writeSingleAvro]] call); a block-granular split via the container's
  * sync markers is the upgrade path if single huge avro files ever
  * appear — `DataFileReader.sync(pos)` seeks exactly like the Hadoop
  * input format would.
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
      case LONG => LongType
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case BOOLEAN => BooleanType
      case STRING => StringType
      case BYTES => BinaryType
      case other => sys.error(
        s"AvroDataRead: unsupported avro type $other — data files in " +
          "this layout carry flat scalar schemas")
    }
  }

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  /** Avro runtime value → Spark external Row value. */
  private def convert(v: Any, s: Schema): Any = {
    import Schema.Type._
    if (v == null) null
    else s.getType match {
      case UNION =>
        val branches = s.getTypes
        val nonNull = (0 until branches.size).map(branches.get)
          .filterNot(_.getType == NULL).head
        convert(v, nonNull)
      case INT if logical(s) == "date" =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case LONG if logical(s) == "timestamp-micros" =>
        val us = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt); ts
      case STRING => v.toString // Utf8 -> String
      case BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer].duplicate()
        val out = new Array[Byte](bb.remaining()); bb.get(out); out
      case _ => v
    }
  }

  /** Read `paths` (absolute, scheme-normalized local/Hadoop paths) with
    * columns `<data columns> + file_path(string) + pos(long)`. All
    * files must share one record schema (one table's manifest entries). */
  def readWithPos(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "AvroDataRead.readWithPos: empty file list")
    // driver: container headers only — schema agreement
    val schemas = paths.map { p =>
      val r = new DataFileReader[GenericRecord](new java.io.File(p),
        new GenericDatumReader[GenericRecord]())
      try (p, r.getSchema.toString) finally r.close()
    }
    val schemaStr = schemas.head._2
    val disagree = schemas.filter(_._2 != schemaStr).map(_._1)
    require(disagree.isEmpty,
      s"AvroDataRead: files disagree on schema: ${disagree.take(3).mkString(", ")}")
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
    val n = math.max(1, math.min(paths.size,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(paths, n).flatMap { path =>
      val reader = new DataFileReader[GenericRecord](
        new java.io.File(path), new GenericDatumReader[GenericRecord]())
      val fs = reader.getSchema.getFields.asScala.toSeq
      // close with the TASK: a LIMIT-terminated or failed task abandons
      // the iterator mid-stream and exhaustion-close alone would leak
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      new Iterator[Row] {
        private var i = 0L
        override def hasNext: Boolean = reader.hasNext
        override def next(): Row = {
          val rec = reader.next()
          val vals = new Array[Any](fs.size + 2)
          var c = 0
          while (c < fs.size) {
            vals(c) = convert(rec.get(c), fs(c).schema()); c += 1
          }
          vals(fs.size) = path
          vals(fs.size + 1) = i
          i += 1
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
