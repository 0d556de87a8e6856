package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector._
import org.apache.orc.{OrcFile, TypeDescription}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Task-side data-file writers, one per spec `file_format` (PARQUET,
  * ORC, AVRO — the three formats a manifest entry may declare;
  * reference: iceberg-diag reads all three through its manifest walk,
  * manager.py's file_format field). The connector's partition-aware
  * writer ([[GraftDataWriter]]) opens one of these per partition-value
  * sink; which one is the table's `write.format.default` property —
  * Iceberg's own knob — so a pure-SQL user can accrete ORC/AVRO tables
  * the engine's readers (q227/q259/q260 paths) already understand.
  *
  * Dialect bounds: ORC and AVRO task files carry scalar schemas
  * (long/int/double/float/boolean/string) plus ONE level of struct
  * nesting (the multimodal typed-metadata shape) — same as the parquet
  * arm. Arrays (vector columns) stay on parquet, where the 3-level
  * LIST encoding exists; an array write under a non-parquet default
  * fails loudly at writer construction, never mid-file.
  */
private[v2] trait GraftPhysicalWriter {
  def write(record: InternalRow): Unit
  def close(): Unit
  /** Running buffered-size estimate for write.target-file-size-bytes
    * rolling. Parquet reports its own buffer; ORC/AVRO estimate from
    * written value widths — rolling is a size heuristic, not an exact
    * accounting. */
  def dataSize: Long
}

private[graft] object GraftFormatWriters {

  /** Minimum byte width whose two's-complement range covers every
    * unscaled value of a decimal with `precision` digits — the Iceberg
    * spec's fixed-length encoding for wide decimals ("Stored as fixed
    * using the minimum number of bytes for the given precision",
    * Appendix A). precision 19 → 9 bytes, 38 → 16. */
  private[graft] def decimalFixedBytes(precision: Int): Int = {
    val max = BigInt(10).pow(precision) - 1
    var n = 1
    while ((BigInt(1) << (8 * n - 1)) - 1 < max) n += 1
    n
  }

  /** `unscaled` sign-extended (two's complement) to exactly `len` bytes
    * — the fixed-width value both parquet FIXED_LEN_BYTE_ARRAY and avro
    * `fixed` decimals store. */
  private[graft] def signExtend(unscaled: java.math.BigInteger,
      len: Int): Array[Byte] = {
    val raw = unscaled.toByteArray
    require(raw.length <= len,
      s"decimal unscaled value needs ${raw.length} bytes > fixed width $len")
    if (raw.length == len) raw
    else {
      val out = new Array[Byte](len)
      val pad: Byte = if (unscaled.signum() < 0) -1 else 0
      java.util.Arrays.fill(out, 0, len - raw.length, pad)
      System.arraycopy(raw, 0, out, len - raw.length, raw.length)
      out
    }
  }

  /** Manifest `file_format` for a written data file — by extension, the
    * same convention [[graft.sources.DeletionVectors.isDvPath]] uses for
    * puffin. */
  def formatOf(path: String): String =
    if (path.endsWith(".orc")) "ORC"
    else if (path.endsWith(".avro")) "AVRO"
    else "PARQUET"

  /** File extension for a normalized `write.format.default` value. */
  def extensionOf(format: String): String = format match {
    case "orc" => "orc"
    case "avro" => "avro"
    case _ => "parquet"
  }

  /** Normalize + validate the property value ("parquet" when unset). */
  def normalize(format: Option[String]): String =
    format.map(_.toLowerCase).getOrElse("parquet") match {
      case f @ ("parquet" | "orc" | "avro") => f
      case other => sys.error(
        s"graft-iceberg: unsupported write.format.default '$other' " +
          "(parquet | orc | avro)")
    }

  private[v2] def create(format: String, file: java.io.File,
      schema: StructType,
      fieldIds: Map[String, Int]): GraftPhysicalWriter = format match {
    case "orc" => new OrcTaskWriter(file, schema)
    case "avro" => new AvroTaskWriter(file, schema, fieldIds)
    case _ => new ParquetTaskWriter(file, schema, fieldIds)
  }

  /** ORC/AVRO dialect bound: scalars plus ONE level of struct nesting
    * (same as the parquet arm). Arrays and deeper nesting refuse at
    * writer construction, never mid-file. */
  private[v2] def requireWritable(schema: StructType, format: String): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case st: StructType => st.fields.foreach(nf => require(
          !nf.dataType.isInstanceOf[StructType] &&
            !nf.dataType.isInstanceOf[ArrayType],
          s"graft-iceberg: struct nesting is one level of scalars — " +
            s"${f.name}.${nf.name} cannot be written as $format"))
        case _: ArrayType => sys.error(
          s"graft-iceberg: array column ${f.name} cannot be written as " +
            s"$format — vector columns need parquet (set " +
            "write.format.default=parquet)")
        case _ => ()
      }
    }
}

/** The parquet arm — the connector's original writer, verbatim: flat
  * primitives plus ONE level of struct nesting, stable field ids
  * embedded so post-RENAME readers resolve by id. */
private[v2] class ParquetTaskWriter(file: java.io.File, schema: StructType,
    fieldIds: Map[String, Int]) extends GraftPhysicalWriter {

  private val msgType = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    def primOf(dt: DataType, name: String,
        id: Option[Int]): org.apache.parquet.schema.Type = {
      val pb = dt match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        // Iceberg `date`: INT32 epoch days; `timestamptz`: INT64 micros
        // UTC-adjusted; `binary`: raw BINARY — the spec's parquet
        // physical mappings (Appendix A)
        case DateType =>
          Types.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case BinaryType => Types.optional(BINARY)
        // decimal(P<=18, S): INT64 unscaled (Iceberg's parquet mapping
        // for long-backed precision); decimal(P>18, S): FIXED_LEN_BYTE_
        // ARRAY of the minimum width for P digits (spec Appendix A)
        case d: DecimalType if d.precision <= 18 =>
          Types.optional(INT64).as(
            LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case d: DecimalType =>
          Types.optional(FIXED_LEN_BYTE_ARRAY)
            .length(GraftFormatWriters.decimalFixedBytes(d.precision))
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case other => sys.error(s"graft-iceberg write: unsupported type $other")
      }
      id.fold(pb)(pb.id).named(name)
    }
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        // ONE level of nesting: a struct of primitives becomes an
        // optional parquet group (typed metadata riding next to opaque
        // payloads — the multimodal-corpus shape). Leaves resolve by
        // name within their group; the STRUCT's stable field id is
        // embedded on the group node.
        case st: StructType =>
          val gb = Types.optionalGroup()
          st.fields.foreach { nf =>
            require(!nf.dataType.isInstanceOf[StructType],
              s"graft-iceberg write: struct nesting is one level " +
                s"(${f.name}.${nf.name} is a struct)")
            // leaf ids ride dotted keys (bootstrapped at the struct's
            // first nested ALTER) — renamed leaves then resolve by id
            gb.addField(primOf(nf.dataType, nf.name,
              fieldIds.get(s"${f.name}.${nf.name}")))
          }
          b.addField(fieldIds.get(f.name).fold(gb)(gb.id).named(f.name))
        // arrays of primitives — the VECTOR column shape (embeddings as
        // first-class lake data): the spec's standard 3-level LIST
        case at: org.apache.spark.sql.types.ArrayType =>
          require(!at.elementType.isInstanceOf[StructType] &&
            !at.elementType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
            s"graft-iceberg write: array elements must be primitive " +
              s"(${f.name} holds ${at.elementType.sql})")
          val lb = Types.optionalList()
            .element(primOf(at.elementType, "element", None))
          b.addField(fieldIds.get(f.name).fold(lb)(lb.id).named(f.name))
        case dt =>
          // the column's stable field id (descriptor `column-ids`),
          // embedded into the file so a post-RENAME reader resolves
          // this column by ID no matter what it was called at write
          b.addField(primOf(dt, f.name, fieldIds.get(f.name)))
      }
    }
    b.named("row")
  }

  private val factory = new SimpleGroupFactory(msgType)

  private val writer: ParquetWriter[org.apache.parquet.example.data.Group] = {
    val conf = new Configuration()
    GroupWriteSupport.setSchema(msgType, conf)
    ExampleParquetWriter.builder(new Path(file.getAbsolutePath))
      .withConf(conf)
      .build()
  }

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
          case DateType => g.add(f.name, record.getInt(i)) // epoch days
          case TimestampType => g.add(f.name, record.getLong(i)) // micros
          case BinaryType => g.add(f.name,
            org.apache.parquet.io.api.Binary
              .fromConstantByteArray(record.getBinary(i)))
          case d: DecimalType if d.precision <= 18 => g.add(f.name,
            record.getDecimal(i, d.precision, d.scale).toUnscaledLong)
          case d: DecimalType => g.add(f.name,
            org.apache.parquet.io.api.Binary.fromConstantByteArray(
              GraftFormatWriters.signExtend(
                record.getDecimal(i, d.precision, d.scale)
                  .toJavaBigDecimal.unscaledValue(),
                GraftFormatWriters.decimalFixedBytes(d.precision))))
          case st: StructType =>
            val sr = record.getStruct(i, st.length)
            val ng = g.addGroup(f.name)
            var k = 0
            while (k < st.length) {
              if (!sr.isNullAt(k)) {
                val nf = st.fields(k)
                nf.dataType match {
                  case LongType => ng.add(nf.name, sr.getLong(k))
                  case IntegerType => ng.add(nf.name, sr.getInt(k))
                  case DoubleType => ng.add(nf.name, sr.getDouble(k))
                  case FloatType => ng.add(nf.name, sr.getFloat(k))
                  case BooleanType => ng.add(nf.name, sr.getBoolean(k))
                  case StringType =>
                    ng.add(nf.name, sr.getUTF8String(k).toString)
                  case DateType => ng.add(nf.name, sr.getInt(k))
                  case TimestampType => ng.add(nf.name, sr.getLong(k))
                  case BinaryType => ng.add(nf.name,
                    org.apache.parquet.io.api.Binary
                      .fromConstantByteArray(sr.getBinary(k)))
                  case other => sys.error(
                    s"graft-iceberg write: unsupported nested type $other")
                }
              }
              k += 1
            }
          case at: org.apache.spark.sql.types.ArrayType =>
            // standard 3-level LIST: one repeated `list` group per
            // element, null elements as element-less groups
            val arr = record.getArray(i)
            val lg = g.addGroup(f.name)
            var k = 0
            while (k < arr.numElements()) {
              val eg = lg.addGroup("list")
              if (!arr.isNullAt(k)) at.elementType match {
                case LongType => eg.add("element", arr.getLong(k))
                case IntegerType => eg.add("element", arr.getInt(k))
                case DoubleType => eg.add("element", arr.getDouble(k))
                case FloatType => eg.add("element", arr.getFloat(k))
                case BooleanType => eg.add("element", arr.getBoolean(k))
                case StringType =>
                  eg.add("element", arr.getUTF8String(k).toString)
                case other => sys.error(
                  s"graft-iceberg write: unsupported element type $other")
              }
              k += 1
            }
          case other => sys.error(s"graft-iceberg write: unsupported type $other")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def close(): Unit = writer.close()

  override def dataSize: Long = writer.getDataSize
}

/** ORC arm: orc-core `Writer` fed vectorized batches — scalar schemas
  * plus ONE level of struct nesting (TypeDescription structs, the
  * multimodal typed-metadata shape). Rows read back with REAL ordinals
  * via [[graft.sources.OrcPosRead]] (stripe-granular,
  * `RecordReader.getRowNumber`), so MOR position deletes apply to
  * SQL-written ORC exactly like parquet. */
private[v2] class OrcTaskWriter(file: java.io.File, schema: StructType)
    extends GraftPhysicalWriter {
  GraftFormatWriters.requireWritable(schema, "ORC")

  private def scalarTd(dt: DataType): TypeDescription = dt match {
    case LongType => TypeDescription.createLong()
    case IntegerType => TypeDescription.createInt()
    case DoubleType => TypeDescription.createDouble()
    case FloatType => TypeDescription.createFloat()
    case BooleanType => TypeDescription.createBoolean()
    case StringType => TypeDescription.createString()
    case DateType => TypeDescription.createDate()
    case TimestampType => TypeDescription.createTimestampInstant()
    case BinaryType => TypeDescription.createBinary()
    // ORC decimals are HiveDecimal-backed natively up to the spec's
    // precision 38 ceiling — no wide/narrow split needed
    case d: DecimalType =>
      TypeDescription.createDecimal()
        .withPrecision(d.precision).withScale(d.scale)
    case other =>
      sys.error(s"graft-iceberg write: unsupported ORC type $other")
  }

  private val td = {
    val t = TypeDescription.createStruct()
    schema.fields.foreach { f =>
      val c = f.dataType match {
        case st: StructType =>
          val n = TypeDescription.createStruct()
          st.fields.foreach(nf => n.addField(nf.name, scalarTd(nf.dataType)))
          n
        case dt => scalarTd(dt)
      }
      t.addField(f.name, c)
    }
    t
  }

  private val writer = OrcFile.createWriter(new Path(file.getAbsolutePath),
    OrcFile.writerOptions(new Configuration()).setSchema(td).overwrite(true))
  private val batch: VectorizedRowBatch = td.createRowBatch()
  private var approxBytes = 0L

  private def setScalar(vec: ColumnVector, r: Int, dt: DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): Unit = dt match {
    case LongType =>
      vec.asInstanceOf[LongColumnVector].vector(r) = row.getLong(i)
      approxBytes += 8
    case IntegerType =>
      vec.asInstanceOf[LongColumnVector].vector(r) = row.getInt(i).toLong
      approxBytes += 4
    case DoubleType =>
      vec.asInstanceOf[DoubleColumnVector].vector(r) = row.getDouble(i)
      approxBytes += 8
    case FloatType =>
      vec.asInstanceOf[DoubleColumnVector].vector(r) =
        row.getFloat(i).toDouble
      approxBytes += 4
    case BooleanType =>
      vec.asInstanceOf[LongColumnVector].vector(r) =
        if (row.getBoolean(i)) 1L else 0L
      approxBytes += 1
    case StringType =>
      val b = row.getUTF8String(i).getBytes
      vec.asInstanceOf[BytesColumnVector].setVal(r, b, 0, b.length)
      approxBytes += b.length + 4
    case DateType => // epoch days, ORC DATE's own representation
      vec.asInstanceOf[LongColumnVector].vector(r) = row.getInt(i).toLong
      approxBytes += 4
    case TimestampType =>
      val us = row.getLong(i) // micros UTC
      val t = vec.asInstanceOf[TimestampColumnVector]
      t.time(r) = Math.floorDiv(us, 1000000L) * 1000L +
        Math.floorDiv(Math.floorMod(us, 1000000L), 1000L)
      t.nanos(r) = (Math.floorMod(us, 1000000L) * 1000L).toInt
      approxBytes += 8
    case BinaryType =>
      val b = row.getBinary(i)
      vec.asInstanceOf[BytesColumnVector].setVal(r, b, 0, b.length)
      approxBytes += b.length + 4
    case d: DecimalType =>
      vec.asInstanceOf[DecimalColumnVector].set(r,
        new org.apache.hadoop.hive.serde2.io.HiveDecimalWritable(
          org.apache.hadoop.hive.common.`type`.HiveDecimal.create(
            row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal)))
      approxBytes += 8
    case other =>
      sys.error(s"graft-iceberg write: unsupported ORC type $other")
  }

  override def write(record: InternalRow): Unit = {
    val r = batch.size
    var i = 0
    while (i < schema.length) {
      val vec = batch.cols(i)
      if (record.isNullAt(i)) {
        vec.noNulls = false
        vec.isNull(r) = true
      } else schema.fields(i).dataType match {
        case st: StructType =>
          val sv = vec.asInstanceOf[StructColumnVector]
          val sr = record.getStruct(i, st.length)
          var k = 0
          while (k < st.length) {
            if (sr.isNullAt(k)) {
              sv.fields(k).noNulls = false
              sv.fields(k).isNull(r) = true
            } else setScalar(sv.fields(k), r, st.fields(k).dataType, sr, k)
            k += 1
          }
        case dt => setScalar(vec, r, dt, record, i)
      }
      i += 1
    }
    batch.size += 1
    if (batch.size == batch.getMaxSize) {
      writer.addRowBatch(batch)
      batch.reset()
    }
  }

  override def close(): Unit = {
    if (batch.size > 0) { writer.addRowBatch(batch); batch.reset() }
    writer.close()
  }

  override def dataSize: Long = approxBytes
}

/** AVRO arm: avro-core `DataFileWriter` of GenericRecords — scalar
  * schemas plus ONE level of record-in-record nesting, `["null", T]`
  * unions, the column's stable field id carried as the Iceberg avro
  * `field-id` property (nested leaves via their dotted-key ids). Rows
  * read back with real ordinals via [[graft.sources.AvroDataRead]]
  * (sequential container — iteration index IS the position). */
private[v2] class AvroTaskWriter(file: java.io.File, schema: StructType,
    fieldIds: Map[String, Int]) extends GraftPhysicalWriter {
  GraftFormatWriters.requireWritable(schema, "AVRO")

  import org.apache.avro.{Schema => ASchema}
  import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

  private val avroSchema: ASchema = {
    def prim(dt: DataType): ASchema = dt match {
      case LongType => ASchema.create(ASchema.Type.LONG)
      case IntegerType => ASchema.create(ASchema.Type.INT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case StringType => ASchema.create(ASchema.Type.STRING)
      // the Iceberg avro mappings: date = int/date, timestamptz =
      // long/timestamp-micros, binary = bytes
      case DateType => org.apache.avro.LogicalTypes.date()
        .addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      // decimal(P<=18): bytes-backed (this writer's original dialect);
      // decimal(P>18): the spec's `fixed` of minimum width — the fixed
      // type NAME carries precision+scale so equal decimal columns share
      // one schema definition (avro named-type rule)
      case d: DecimalType if d.precision <= 18 =>
        org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(ASchema.create(ASchema.Type.BYTES))
      case d: DecimalType =>
        org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(ASchema.createFixed(
            s"dec_${d.precision}_${d.scale}", null, "graft.data",
            GraftFormatWriters.decimalFixedBytes(d.precision)))
      case other =>
        sys.error(s"graft-iceberg write: unsupported AVRO type $other")
    }
    def fieldOf(name: String, dt: ASchema, id: Option[Int]): ASchema.Field = {
      val fld = new ASchema.Field(name,
        ASchema.createUnion(ASchema.create(ASchema.Type.NULL), dt),
        null, ASchema.Field.NULL_DEFAULT_VALUE)
      // Iceberg's avro field-id convention ("Avro" appendix): the stable
      // column id rides the field as a `field-id` property
      id.foreach(fld.addProp("field-id", _))
      fld
    }
    val fields = schema.fields.map { f =>
      f.dataType match {
        case st: StructType =>
          // record-in-record: leaf ids ride dotted keys, same bootstrap
          // as the parquet arm's nested groups
          val kids = st.fields.map(nf => fieldOf(nf.name, prim(nf.dataType),
            fieldIds.get(s"${f.name}.${nf.name}")))
          val rec = ASchema.createRecord(s"${f.name}_r", null,
            "graft.data", false, java.util.Arrays.asList(kids: _*))
          fieldOf(f.name, rec, fieldIds.get(f.name))
        case dt => fieldOf(f.name, prim(dt), fieldIds.get(f.name))
      }
    }
    ASchema.createRecord("row", null, "graft.data", false,
      java.util.Arrays.asList(fields: _*))
  }

  private val writer = {
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    org.apache.commons.io.FileUtils.deleteQuietly(file)
    w.create(avroSchema, file)
    w
  }
  private var approxBytes = 0L
  // one `fixed` schema per distinct wide-decimal (precision, scale) —
  // GenericData.Fixed needs the named type it was declared with
  private val fixedSchemas =
    scala.collection.mutable.Map.empty[(Int, Int), ASchema]

  private def box(dt: DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): AnyRef = dt match {
    case LongType => approxBytes += 8; Long.box(row.getLong(i))
    case IntegerType => approxBytes += 4; Int.box(row.getInt(i))
    case DoubleType => approxBytes += 8; Double.box(row.getDouble(i))
    case FloatType => approxBytes += 4; Float.box(row.getFloat(i))
    case BooleanType => approxBytes += 1; Boolean.box(row.getBoolean(i))
    case StringType =>
      val s = row.getUTF8String(i).toString
      approxBytes += s.length + 4; s
    case DateType => approxBytes += 4; Int.box(row.getInt(i)) // epoch days
    case TimestampType => approxBytes += 8; Long.box(row.getLong(i)) // µs
    case BinaryType =>
      val b = row.getBinary(i)
      approxBytes += b.length + 4; java.nio.ByteBuffer.wrap(b)
    case d: DecimalType if d.precision <= 18 =>
      // unscaled two's-complement bytes (avro spec)
      approxBytes += 8
      java.nio.ByteBuffer.wrap(row.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.unscaledValue().toByteArray)
    case d: DecimalType => // wide: sign-extended into the spec's `fixed`
      val len = GraftFormatWriters.decimalFixedBytes(d.precision)
      approxBytes += len
      new GenericData.Fixed(
        fixedSchemas.getOrElseUpdate((d.precision, d.scale),
          org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
            .addToSchema(org.apache.avro.Schema.createFixed(
              s"dec_${d.precision}_${d.scale}", null, "graft.data", len))),
        GraftFormatWriters.signExtend(
          row.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue(), len))
    case other =>
      sys.error(s"graft-iceberg write: unsupported AVRO type $other")
  }

  /** A field's non-null branch (fields are `["null", T]` unions). */
  private def branchOf(f: ASchema.Field): ASchema = {
    val ts = f.schema().getTypes
    (0 until ts.size).map(ts.get)
      .filterNot(_.getType == ASchema.Type.NULL).head
  }

  override def write(record: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i)) {
        val v: AnyRef = schema.fields(i).dataType match {
          case st: StructType =>
            val nestedSchema = branchOf(avroSchema.getFields.get(i))
            val sr = record.getStruct(i, st.length)
            val nested = new GenericData.Record(nestedSchema)
            var k = 0
            while (k < st.length) {
              if (!sr.isNullAt(k))
                nested.put(k, box(st.fields(k).dataType, sr, k))
              k += 1
            }
            nested
          case dt => box(dt, record, i)
        }
        rec.put(i, v)
      }
      i += 1
    }
    writer.append(rec)
  }

  override def close(): Unit = writer.close()

  override def dataSize: Long = approxBytes
}
