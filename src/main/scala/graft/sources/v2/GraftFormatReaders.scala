package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.orc.OrcFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Connector-side readers for ORC and AVRO data files — the two other
  * spec `file_format`s a manifest entry may declare. The parquet reader
  * ([[GraftPartitionReader]]) stays the primary path (footer-projected,
  * field-id resolution, nested pruning); these readers make the SAME
  * table surface — merge-on-read tombstones, `_file`/`_pos` metadata
  * columns, schema-evolution null-fill with declared defaults, rename
  * aliases, widening promotions, pushed TABLESAMPLE — hold for data
  * files a `write.format.default=orc|avro` table accreted through pure
  * SQL. Scalar schemas plus ONE level of struct nesting by dialect
  * (struct leaves resolve by name, then by recorded rename alias).
  *
  * Row sources stream: ORC by vectorized batches (the position is the
  * reader's own `getRowNumber` accounting, same as [[graft.sources
  * .OrcPosRead]]); AVRO sequentially (the container's iteration index
  * IS the ordinal, same as [[graft.sources.AvroDataRead]]).
  */
private[v2] trait GraftNamedRows {
  /** The FILE's column names, fixed for the stream's lifetime. */
  def names: Seq[String]
  /** JVM-typed values per row (Long/Int/Double/Float/Boolean/String or
    * null; a one-level STRUCT column yields an `Array[Any]` of its leaf
    * values in file leaf order), index-aligned with [[names]]. */
  def iterator: Iterator[Array[Any]]
  /** File leaf names per STRUCT column index — how the consuming reader
    * resolves TABLE leaves against this file's leaf order. Empty for
    * scalar columns. */
  def structLeaves: Map[Int, Seq[String]] = Map.empty
  def close(): Unit
}

private[v2] object GraftFormatReaders {

  def open(path: String, fileFormat: String): GraftNamedRows =
    fileFormat match {
      case "ORC" => new OrcNamedRows(path)
      case "AVRO" => new AvroNamedRows(path)
      case other => sys.error(
        s"graft-iceberg: no row reader for file_format $other at $path")
    }
}

private[v2] class OrcNamedRows(path: String) extends GraftNamedRows {
  import org.apache.hadoop.hive.ql.exec.vector._
  import org.apache.orc.TypeDescription

  private val reader = OrcFile.createReader(new Path(path),
    OrcFile.readerOptions(new Configuration()))
  private val td = reader.getSchema
  import scala.jdk.CollectionConverters._
  private val cols = td.getChildren.asScala.toSeq
  override val names: Seq[String] = td.getFieldNames.asScala.toSeq
  private val rr = reader.rows()
  private val batch = td.createRowBatch()

  /** Type-specialized extractor per column, built ONCE for the stream —
    * per-value work is one closure call, no per-value category match. */
  private def extractorOf(c: TypeDescription): (ColumnVector, Int) => Any = {
    import TypeDescription.Category._
    val core: (ColumnVector, Int) => Any = c.getCategory match {
      case BOOLEAN => (v, i) => v.asInstanceOf[LongColumnVector].vector(i) != 0L
      case INT => (v, i) => v.asInstanceOf[LongColumnVector].vector(i).toInt
      case LONG => (v, i) => v.asInstanceOf[LongColumnVector].vector(i)
      case FLOAT => (v, i) =>
        v.asInstanceOf[DoubleColumnVector].vector(i).toFloat
      case DOUBLE => (v, i) => v.asInstanceOf[DoubleColumnVector].vector(i)
      case STRING | VARCHAR | CHAR => (v, i) => {
        val b = v.asInstanceOf[BytesColumnVector]
        new String(b.vector(i), b.start(i), b.length(i),
          java.nio.charset.StandardCharsets.UTF_8)
      }
      case DATE => (v, i) => // epoch days, kept as the internal Int
        v.asInstanceOf[LongColumnVector].vector(i).toInt
      case TIMESTAMP | TIMESTAMP_INSTANT => (v, i) => {
        val t = v.asInstanceOf[TimestampColumnVector]
        // micros UTC from (millis, nanos-of-second)
        Math.floorDiv(t.time(i), 1000L) * 1000000L + t.nanos(i) / 1000L
      }
      case BINARY => (v, i) => {
        val b = v.asInstanceOf[BytesColumnVector]
        java.util.Arrays.copyOfRange(b.vector(i), b.start(i),
          b.start(i) + b.length(i))
      }
      case DECIMAL => (v, i) =>
        v.asInstanceOf[DecimalColumnVector].vector(i)
          .getHiveDecimal.bigDecimalValue()
      case STRUCT =>
        // one-level struct: leaves convert into an Array[Any] in FILE
        // leaf order ([[structLeaves]] names them)
        import scala.jdk.CollectionConverters._
        val kids = c.getChildren.asScala.toArray.map(extractorOf)
        (v, i) => {
          val sv = v.asInstanceOf[StructColumnVector]
          val vals = new Array[Any](kids.length)
          var k = 0
          while (k < kids.length) { vals(k) = kids(k)(sv.fields(k), i); k += 1 }
          vals
        }
      case cat => sys.error(
        s"graft-iceberg ORC read: unsupported category $cat — " +
          "scalar and one-level-struct schemas only")
    }
    (vec, row) => {
      val i = if (vec.isRepeating) 0 else row
      if (!vec.noNulls && vec.isNull(i)) null else core(vec, i)
    }
  }

  private val extract = cols.toArray.map(extractorOf)

  override val structLeaves: Map[Int, Seq[String]] =
    cols.zipWithIndex.collect {
      case (c, i) if c.getCategory == TypeDescription.Category.STRUCT =>
        i -> c.getFieldNames.asScala.toSeq
    }.toMap

  override val iterator: Iterator[Array[Any]] = new Iterator[Array[Any]] {
    private var i = 0
    private var nRows = 0
    private var open = true
    private def fill(): Unit =
      if (rr.nextBatch(batch)) { nRows = batch.size; i = 0 }
      else { nRows = 0; open = false }
    fill()
    override def hasNext: Boolean = open && i < nRows
    override def next(): Array[Any] = {
      val out = new Array[Any](extract.length)
      var c = 0
      while (c < extract.length) {
        out(c) = extract(c)(batch.cols(c), i); c += 1
      }
      i += 1
      if (i >= nRows) fill()
      out
    }
  }

  override def close(): Unit = { rr.close(); reader.close() }
}

private[v2] class AvroNamedRows(path: String) extends GraftNamedRows {
  import org.apache.avro.Schema
  import org.apache.avro.file.DataFileReader
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

  private val reader = new DataFileReader[GenericRecord](
    new java.io.File(path), new GenericDatumReader[GenericRecord]())
  import scala.jdk.CollectionConverters._
  private val fields = reader.getSchema.getFields.asScala.toSeq
  override val names: Seq[String] = fields.map(_.name)

  /** Type-specialized converter per field, built ONCE for the stream. */
  private def converterOf(s: Schema): Any => Any = {
    import Schema.Type._
    s.getType match {
      case UNION => converterOf(unwrap(s))
      case STRING => v => if (v == null) null else v.toString // Utf8
      case BYTES
        if Option(s.getLogicalType).exists(
          _.isInstanceOf[org.apache.avro.LogicalTypes.Decimal]) =>
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
      case FIXED
        if Option(s.getLogicalType).exists(
          _.isInstanceOf[org.apache.avro.LogicalTypes.Decimal]) =>
        val scale = s.getLogicalType
          .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
        v =>
          if (v == null) null
          else new java.math.BigDecimal(new java.math.BigInteger(
            v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()),
            scale)
      // date (int/date) and timestamptz (long/timestamp-micros) arrive
      // as raw Int days / Long micros — the internal representations the
      // row assembler wants, so identity covers them below
      case RECORD =>
        // one-level record: leaf values in FILE leaf order
        val kids = s.getFields.asScala.toArray.map(f => converterOf(f.schema()))
        v =>
          if (v == null) null
          else {
            val rec = v.asInstanceOf[GenericRecord]
            val vals = new Array[Any](kids.length)
            var k = 0
            while (k < kids.length) { vals(k) = kids(k)(rec.get(k)); k += 1 }
            vals
          }
      case _ => identity
    }
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else (0 until s.getTypes.size).map(s.getTypes.get)
      .filterNot(_.getType == Schema.Type.NULL).head

  private val conv = fields.toArray.map(f => converterOf(f.schema()))

  override val structLeaves: Map[Int, Seq[String]] =
    fields.zipWithIndex.collect {
      case (f, i) if unwrap(f.schema()).getType == Schema.Type.RECORD =>
        i -> unwrap(f.schema()).getFields.asScala.toSeq.map(_.name)
    }.toMap

  override val iterator: Iterator[Array[Any]] = new Iterator[Array[Any]] {
    // ONE reused record: the decoder refills it per row; converters copy
    // every value out before the next read
    private var reuse: GenericRecord = null
    override def hasNext: Boolean = reader.hasNext
    override def next(): Array[Any] = {
      reuse = reader.next(reuse)
      val out = new Array[Any](conv.length)
      var c = 0
      while (c < conv.length) { out(c) = conv(c)(reuse.get(c)); c += 1 }
      out
    }
  }

  override def close(): Unit = reader.close()
}

/** [[PartitionReader]] over a [[GraftNamedRows]] stream: the non-parquet
  * twin of [[GraftPartitionReader]], same read semantics per row. */
private[v2] class GraftRowPartitionReader(part: GraftFilePartition,
    required: StructType,
    sample: Option[(Double, Double, Long)] = None)
    extends PartitionReader[InternalRow] {

  private val path = part.path
  private val rows = GraftFormatReaders.open(path, part.fileFormat)
  private val nameIdx: Map[String, Int] = rows.names.zipWithIndex.toMap

  private val isMeta: Array[Boolean] =
    required.fields.map(f => f.name == GraftTable.FileMetadataColumn ||
      f.name == GraftTable.PosMetadataColumn)
  private val isPos: Array[Boolean] =
    required.fields.map(_.name == GraftTable.PosMetadataColumn)
  // the column's index in THIS file: by name, else by recorded former
  // name (rename alias — these formats carry no embedded parquet ids);
  // -1 = pre-evolution file for an added column: default/null-fill
  private val colIdx: Array[Int] = required.fields.map { f =>
    nameIdx.get(f.name).orElse {
      val aliases =
        if (!f.metadata.contains(GraftCatalog.AliasesKey)) Nil
        else f.metadata.getString(GraftCatalog.AliasesKey)
          .split(',').toSeq.filter(_.nonEmpty)
      aliases.collectFirst {
        case a if nameIdx.contains(a) => nameIdx(a)
      }
    }.getOrElse(-1)
  }
  private lazy val absentValue: Array[Any] = required.fields.map { f =>
    if (!f.metadata.contains("EXISTS_DEFAULT")) null
    else {
      val expr = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(f.metadata.getString("EXISTS_DEFAULT"))
      org.apache.spark.sql.catalyst.expressions.Cast(
        expr, f.dataType, Some("UTC")).eval(null)
    }
  }
  // eq-delete key columns readable even when unprojected — resolved by
  // table name, else a recorded former name (pre-rename files)
  private val eqKeyIdx: Map[String, Int] =
    part.eqDeletes.flatMap(_._2).distinct
      .flatMap(k => nameIdx.get(k)
        .orElse(part.keyAliases.getOrElse(k, Nil)
          .collectFirst { case a if nameIdx.contains(a) => nameIdx(a) })
        .map(k -> _)).toMap

  // table struct leaf → file leaf index, resolved by name then by
  // recorded former name (rename alias); -1 = leaf added after this
  // file was written: null-fill
  private lazy val leafIdx: Array[Array[Int]] =
    required.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case st: StructType if colIdx(i) >= 0 =>
          val fileLeaves = rows.structLeaves.getOrElse(colIdx(i), Nil)
            .zipWithIndex.toMap
          st.fields.map { nf =>
            fileLeaves.get(nf.name).orElse {
              val aliases =
                if (!nf.metadata.contains(GraftCatalog.AliasesKey)) Nil
                else nf.metadata.getString(GraftCatalog.AliasesKey)
                  .split(',').toSeq.filter(_.nonEmpty)
              aliases.collectFirst {
                case a if fileLeaves.contains(a) => fileLeaves(a) }
            }.getOrElse(-1)
          }
        case _ => Array.empty[Int]
      }
    }

  private lazy val deadPositions: Set[Long] =
    GraftPartitionReader.positionsFor(path, part.posDeletes)
  private lazy val eqSets: Seq[(Seq[String], Set[Seq[Any]])] =
    GraftPartitionReader.eqTuplesFor(part.eqDeletes)

  private val it = rows.iterator
  private var current: Array[Any] = _
  private var rowIdx: Long = -1L

  private def keyValue(vals: Array[Any], k: String): Any =
    eqKeyIdx.get(k).map(vals(_)).orNull match {
      // decimals reduce to the scale-free comparable the parquet side's
      // tuple decoding uses ([[GraftPartitionReader.normDecimal]])
      case d: java.math.BigDecimal => GraftPartitionReader.normDecimal(d)
      case v => v
    }

  private def deleted(vals: Array[Any]): Boolean = {
    if (part.posDeletes.nonEmpty && deadPositions.contains(rowIdx)) return true
    if (part.eqDeletes.isEmpty) return false
    eqSets.exists { case (keys, tuples) =>
      tuples.contains(keys.map(k => keyValue(vals, k)))
    }
  }

  // same ordinal-keyed keep hash as the parquet reader — a TABLESAMPLE
  // must not depend on the table's physical format
  private def sampleKeep(): Boolean = sample match {
    case None => true
    case Some((lo, hi, seed)) =>
      var x = scala.util.hashing.MurmurHash3
        .stringHash(path, seed.toInt).toLong * 0x9E3779B97F4A7C15L +
        rowIdx * 0xC2B2AE3D27D4EB4FL + seed
      x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
      val u = (x >>> 11).toDouble / (1L << 53).toDouble
      lo <= u && u < hi
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      current = it.next()
      rowIdx += 1
      if (!deleted(current) && sampleKeep()) return true
    }
    current = null
    false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      if (isPos(i)) row.setLong(i, rowIdx)
      else if (isMeta(i)) row.update(i, UTF8String.fromString(path))
      else if (colIdx(i) < 0) row.update(i, absentValue(i))
      else {
        val v = current(colIdx(i))
        if (v == null) row.update(i, null)
        else f.dataType match {
          // per-value widening for pre-ALTER files (int->long,
          // float->double), same as the parquet reader
          case LongType => v match {
            case x: Long => row.setLong(i, x)
            case x: Int => row.setLong(i, x.toLong)
            case other => sys.error(s"graft-iceberg: $other as LONG")
          }
          case IntegerType => row.setInt(i, v.asInstanceOf[Int])
          case DoubleType => v match {
            case x: Double => row.setDouble(i, x)
            case x: Float => row.setDouble(i, x.toDouble)
            case other => sys.error(s"graft-iceberg: $other as DOUBLE")
          }
          case FloatType => row.setFloat(i, v.asInstanceOf[Float])
          case BooleanType => row.setBoolean(i, v.asInstanceOf[Boolean])
          case StringType =>
            row.update(i, UTF8String.fromString(v.asInstanceOf[String]))
          case DateType => row.setInt(i, v.asInstanceOf[Int]) // epoch days
          case TimestampType => row.setLong(i, v.asInstanceOf[Long]) // µs
          case BinaryType => row.update(i, v.asInstanceOf[Array[Byte]])
          case d: DecimalType =>
            val dec = org.apache.spark.sql.types.Decimal(
              v.asInstanceOf[java.math.BigDecimal])
            require(dec.changePrecision(d.precision, d.scale),
              s"graft-iceberg: decimal $v does not fit ${d.sql}")
            row.update(i, dec)
          case st: StructType =>
            // one-level struct: file leaf values re-ordered into the
            // TABLE's leaf layout (name/alias-resolved, absent = null)
            val leaves = v.asInstanceOf[Array[Any]]
            val li = leafIdx(i)
            val out = new GenericInternalRow(st.length)
            var k = 0
            while (k < st.length) {
              val lv = if (li(k) < 0) null else leaves(li(k))
              if (lv == null) out.update(k, null)
              else st.fields(k).dataType match {
                case StringType =>
                  out.update(k, UTF8String.fromString(lv.asInstanceOf[String]))
                case LongType => lv match {
                  case x: Long => out.setLong(k, x)
                  case x: Int => out.setLong(k, x.toLong)
                  case other => sys.error(s"graft-iceberg: $other as LONG")
                }
                case DoubleType => lv match {
                  case x: Double => out.setDouble(k, x)
                  case x: Float => out.setDouble(k, x.toDouble)
                  case other => sys.error(s"graft-iceberg: $other as DOUBLE")
                }
                case d: DecimalType =>
                  val dec = org.apache.spark.sql.types.Decimal(
                    lv.asInstanceOf[java.math.BigDecimal])
                  require(dec.changePrecision(d.precision, d.scale),
                    s"graft-iceberg: decimal $lv does not fit ${d.sql}")
                  out.update(k, dec)
                case _ => out.update(k, lv)
              }
              k += 1
            }
            row.update(i, out)
          case other => sys.error(
            s"graft-iceberg: unsupported type $other for file_format " +
              part.fileFormat)
        }
      }
      i += 1
    }
    row
  }

  override def close(): Unit = rows.close()
}
