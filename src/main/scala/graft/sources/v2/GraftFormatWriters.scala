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
  * Dialect bounds: all three formats carry scalars plus structs,
  * arrays, and maps composed to ANY depth (round 13 — ORC
  * lists/structs, avro arrays/records, parquet groups/3-level LISTs;
  * round 14 — parquet MAP key_value groups, ORC MapColumnVector, avro
  * map-of-V for string keys / logicalType-"map" array-of-record for
  * non-string keys, per Iceberg's Avro appendix).
  */
private[v2] trait GraftPhysicalWriter {
  def write(record: InternalRow): Unit
  def close(): Unit
  /** Running buffered-size estimate for write.target-file-size-bytes
    * rolling. Parquet reports its own buffer; ORC/AVRO estimate from
    * written value widths — rolling is a size heuristic, not an exact
    * accounting. */
  def dataSize: Long
  /** Per TOP-LEVEL-column on-disk bytes, available after [[close]] and
    * only when the format writer exposes its own footer in memory —
    * byte-identical to a footer re-read of the closed file, so commit
    * metadata (spec column_sizes, field 108) pipelines with the write
    * instead of re-opening every rolled file. None = the caller falls
    * back to the footer re-read. */
  def closedColumnSizes: Option[Map[String, Long]] = None
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

  /** StructField metadata key carrying a column's LAKE TYPE when it is
    * narrower than the Spark type: `uuid` (Spark STRING, stored per the
    * Iceberg spec as 16 fixed bytes) or `fixed[N]` (Spark BINARY,
    * stored as exactly-N fixed bytes). Declared per column via the
    * table property `graft.lake-type.<column>`; the write builders
    * annotate the write schema so the task-side writers see it.
    * Physical encodings: parquet FIXED_LEN_BYTE_ARRAY(16) with the UUID
    * annotation / FIXED_LEN_BYTE_ARRAY(N); avro `fixed` of 16 carrying
    * `logicalType: uuid` / `fixed` of N (Iceberg spec Appendix A + the
    * Avro appendix). ORC stores uuid as STRING and fixed as BINARY —
    * this layout's dialect, so Spark's native ORC scans (the MOR fast
    * path) keep working; readers accept both encodings either way. */
  val LakeTypeKey = "graft.lake-type"

  /** Table-property prefix → (column → lake type). */
  def lakeTypesOf(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith("graft.lake-type.") =>
      k.stripPrefix("graft.lake-type.") -> v.toLowerCase }

  /** Byte width of a `fixed[N]` lake type. */
  def fixedLenOf(lakeType: String): Int = {
    val n = lakeType.stripPrefix("fixed[").stripSuffix("]").toInt
    require(n > 0, s"graft-iceberg: bad lake type $lakeType")
    n
  }

  /** The spec's 16-byte big-endian UUID encoding. */
  def uuidBytes(s: String): Array[Byte] = {
    val u = java.util.UUID.fromString(s)
    java.nio.ByteBuffer.allocate(16)
      .putLong(u.getMostSignificantBits)
      .putLong(u.getLeastSignificantBits).array()
  }

  /** Canonical lower-case UUID string of the 16-byte encoding. */
  def uuidString(b: Array[Byte]): String = {
    require(b.length == 16, s"graft-iceberg: uuid needs 16 bytes, got ${b.length}")
    val bb = java.nio.ByteBuffer.wrap(b)
    new java.util.UUID(bb.getLong, bb.getLong).toString
  }

  /** Annotate `schema` with [[LakeTypeKey]] metadata from a
    * (column → lake type) declaration, validating the Spark-side type
    * (uuid rides STRING, fixed[N] rides BINARY). The write builders
    * call this on the write schema (which loses table metadata through
    * the INSERT plan). */
  def annotateLakeTypes(schema: StructType,
      lakeTypes: Map[String, String]): StructType =
    if (lakeTypes.isEmpty) schema
    else StructType(schema.fields.map { f =>
      lakeTypes.get(f.name) match {
        case Some(lt) =>
          require((lt == "uuid" && f.dataType == StringType) ||
            (GeoLake.isGeoType(lt) && f.dataType == BinaryType) ||
            lt == "unknown" ||
            (lt.startsWith("fixed[") && lt.endsWith("]") &&
              f.dataType == BinaryType),
            s"graft-iceberg: lake type $lt cannot annotate column " +
              s"${f.name}: ${f.dataType.sql} (uuid needs STRING, " +
              "fixed[N] and geometry/geography need BINARY)")
          if (lt.startsWith("fixed[")) fixedLenOf(lt) // validate N
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putString(LakeTypeKey, lt).build())
        case None => f
      }
    })

  /** Per-top-level-column lake types recorded in a schema's metadata
    * (null = plain column), the writers' dispatch array. */
  private[v2] def lakeTypeArr(schema: StructType): Array[String] =
    schema.fields.map(f =>
      if (f.metadata.contains(LakeTypeKey)) f.metadata.getString(LakeTypeKey)
      else null)

  /** Encode one non-null lake-typed value to its fixed bytes. */
  private[v2] def lakeEncode(lakeType: String,
      src: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): Array[Byte] =
    if (lakeType == "uuid") uuidBytes(src.getUTF8String(i).toString)
    else if (GeoLake.isGeoType(lakeType)) {
      // WKB rides verbatim; parsing the bbox here VALIDATES the bytes —
      // a malformed geometry refuses at write, never poisons pruning
      val b = src.getBinary(i)
      GeoLake.bbox(b)
      b
    }
    else if (lakeType == "unknown") sys.error(
      "graft-iceberg write: `unknown` lake columns are null-only " +
        "(Iceberg v3 unknown type)")
    else {
      val b = src.getBinary(i)
      require(b.length == fixedLenOf(lakeType),
        s"graft-iceberg write: $lakeType value has ${b.length} bytes")
      b
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
      fieldIds: Map[String, Int],
      /** variant shred declarations — honored by the parquet arm (the
        * spec's shredding is a parquet encoding); ORC/AVRO stay
        * unshredded (two-binary pair). */
      shreds: Map[String, Seq[(String, DataType)]] = Map.empty)
      : GraftPhysicalWriter = format match {
    case "orc" => new OrcTaskWriter(file, schema)
    case "avro" => new AvroTaskWriter(file, schema, fieldIds)
    case _ => new ParquetTaskWriter(file, schema, fieldIds, shreds)
  }

  /** Dialect bound: scalars, structs, arrays, and maps compose to any
    * depth in all three formats — nothing left to refuse; kept as the
    * single place a future unsupported composite would refuse at
    * writer construction, never mid-file. */
  private[v2] def requireWritable(schema: StructType, format: String): Unit = {
    def walk(path: String, dt: DataType): Unit = dt match {
      case st: StructType =>
        st.fields.foreach(nf => walk(s"$path.${nf.name}", nf.dataType))
      case at: ArrayType => walk(s"$path.element", at.elementType)
      case mt: MapType =>
        walk(s"$path.key", mt.keyType); walk(s"$path.value", mt.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => walk(f.name, f.dataType))
  }
}

/** The parquet arm — the connector's original writer: primitives plus
  * recursive struct/array composition, stable field ids embedded so
  * post-RENAME readers resolve by id. */
private[v2] class ParquetTaskWriter(file: java.io.File, schema: StructType,
    fieldIds: Map[String, Int],
    /** declared variant shred paths per TOP-LEVEL column
      * ([[graft.sources.v2.VariantShred]]): colName -> (field, type) —
      * those variant columns write the v3 SHREDDED encoding. */
    shreds: Map[String, Seq[(String, DataType)]] = Map.empty)
    extends GraftPhysicalWriter {

  // lake-typed columns (uuid / fixed[N] — top-level, the declaration
  // grain): the schema dispatch below emits FIXED_LEN_BYTE_ARRAY and
  // write() encodes the value bytes directly
  private val lakeType: Array[String] = GraftFormatWriters.lakeTypeArr(schema)

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
        // spec `timestamp` (tz-naive): INT64 micros NOT UTC-adjusted
        case TimestampNTZType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        // spec `time`: INT64 microseconds from midnight (Spark's
        // internal value is NANOS — the writer divides)
        case _: TimeType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timeType(false,
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
    // the same type rebuilt REQUIRED — map KEYS are required per the
    // parquet MAP spec (a key_value entry always carries its key)
    def requiredOf(t: org.apache.parquet.schema.Type)
        : org.apache.parquet.schema.Type =
      if (t.isPrimitive) {
        val p = t.asPrimitiveType()
        val b = Types.required(p.getPrimitiveTypeName)
        if (p.getTypeLength > 0) b.length(p.getTypeLength)
        Option(p.getLogicalTypeAnnotation).foreach(b.as)
        b.named(p.getName)
      } else {
        val g = t.asGroupType()
        val b = Types.requiredGroup()
        Option(g.getLogicalTypeAnnotation).foreach(b.as)
        g.getFields.forEach(f => b.addField(f))
        b.named(g.getName)
      }
    // recursive: a struct of ANYTHING becomes an optional parquet group
    // (leaf ids ride dotted keys — renamed leaves then resolve by id),
    // an array of ANYTHING the spec's standard 3-level LIST, a map of
    // ANYTHING the spec's MAP-annotated repeated key_value group. The
    // column's stable field id (descriptor `column-ids`) is embedded so
    // a post-RENAME reader resolves by ID no matter the write-time name.
    def typeOf(dt: DataType, name: String, path: String,
        id: Option[Int]): org.apache.parquet.schema.Type = dt match {
      case st: StructType =>
        val gb = Types.optionalGroup()
        st.fields.foreach(nf => gb.addField(typeOf(nf.dataType, nf.name,
          s"$path.${nf.name}", fieldIds.get(s"$path.${nf.name}"))))
        id.fold(gb)(gb.id).named(name)
      case at: org.apache.spark.sql.types.ArrayType =>
        val lb = Types.optionalList()
          .element(typeOf(at.elementType, "element", s"$path.element", None))
        id.fold(lb)(lb.id).named(name)
      case mt: org.apache.spark.sql.types.MapType =>
        val kv = Types.repeatedGroup()
          .addField(requiredOf(
            typeOf(mt.keyType, "key", s"$path.key", None)))
          .addField(typeOf(mt.valueType, "value", s"$path.value", None))
          .named("key_value")
        val mb = Types.optionalGroup()
          .as(LogicalTypeAnnotation.mapType()).addField(kv)
        id.fold(mb)(mb.id).named(name)
      // Iceberg v3 VARIANT, unshredded parquet encoding: a group of the
      // two required binaries (metadata, value) — the engine-portable
      // self-describing semi-structured type
      case _: org.apache.spark.sql.types.VariantType =>
        val vb = Types.optionalGroup()
          .addField(Types.required(BINARY).named("metadata"))
        shreds.get(path).filter(_ => path == name) match {
          case None =>
            vb.addField(Types.required(BINARY).named("value"))
          case Some(fields) =>
            // v3 SHREDDED shape: optional residual `value` + a
            // typed_value group of {value, typed_value} field groups
            vb.addField(Types.optional(BINARY).named("value"))
            val tg = Types.optionalGroup()
            fields.foreach { case (fname, fdt) =>
              val inner = Types.optionalGroup()
                .addField(Types.optional(BINARY).named("value"))
              val typedField = fdt match {
                case LongType => Types.optional(INT64)
                case DoubleType => Types.optional(DOUBLE)
                case _ => Types.optional(BINARY)
                  .as(LogicalTypeAnnotation.stringType())
              }
              inner.addField(typedField.named("typed_value"))
              tg.addField(inner.named(fname))
            }
            vb.addField(tg.named("typed_value"))
        }
        id.fold(vb)(vb.id).named(name)
      case dt => primOf(dt, name, id)
    }
    // lake-typed column → the spec's fixed physical encoding: uuid =
    // FIXED_LEN_BYTE_ARRAY(16) + UUID annotation, fixed[N] = plain
    // FIXED_LEN_BYTE_ARRAY(N)
    def lakeOf(lt: String, name: String,
        id: Option[Int]): org.apache.parquet.schema.Type = {
      val pb =
        if (lt == "uuid")
          Types.optional(FIXED_LEN_BYTE_ARRAY)
            .length(16).as(LogicalTypeAnnotation.uuidType())
        // v3 geometry/geography: WKB in BINARY with the parquet GEOMETRY
        // / GEOGRAPHY logical type (Iceberg's default CRS is OGC:CRS84)
        else if (lt == "geometry")
          Types.optional(BINARY)
            .as(LogicalTypeAnnotation.geometryType("OGC:CRS84"))
        else if (lt == "geography")
          Types.optional(BINARY).as(LogicalTypeAnnotation.geographyType())
        // v3 unknown: null-only — an optional BINARY that never carries
        // a value
        else if (lt == "unknown") Types.optional(BINARY)
        else Types.optional(FIXED_LEN_BYTE_ARRAY)
          .length(GraftFormatWriters.fixedLenOf(lt))
      id.fold(pb)(pb.id).named(name)
    }
    val b = Types.buildMessage()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      b.addField(
        if (lakeType(i) != null) lakeOf(lakeType(i), f.name,
          fieldIds.get(f.name))
        else typeOf(f.dataType, f.name, f.name, fieldIds.get(f.name)))
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

  /** Append one non-null value as field `name` of group `g` —
    * recursive: struct → nested group, array → the standard 3-level
    * LIST (null elements as element-less `list` groups). */
  private def addValue(g: org.apache.parquet.example.data.Group,
      name: String, dt: DataType,
      src: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): Unit = dt match {
    case LongType => g.add(name, src.getLong(i))
    case IntegerType => g.add(name, src.getInt(i))
    case DoubleType => g.add(name, src.getDouble(i))
    case FloatType => g.add(name, src.getFloat(i))
    case BooleanType => g.add(name, src.getBoolean(i))
    case StringType => g.add(name, src.getUTF8String(i).toString)
    case DateType => g.add(name, src.getInt(i)) // epoch days
    case TimestampType => g.add(name, src.getLong(i)) // micros
    case TimestampNTZType => g.add(name, src.getLong(i)) // naive micros
    case _: TimeType => g.add(name, src.getLong(i) / 1000L) // nanos→µs
    case BinaryType => g.add(name,
      org.apache.parquet.io.api.Binary
        .fromConstantByteArray(src.getBinary(i)))
    case d: DecimalType if d.precision <= 18 => g.add(name,
      src.getDecimal(i, d.precision, d.scale).toUnscaledLong)
    case d: DecimalType => g.add(name,
      org.apache.parquet.io.api.Binary.fromConstantByteArray(
        GraftFormatWriters.signExtend(
          src.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue(),
          GraftFormatWriters.decimalFixedBytes(d.precision))))
    case st: StructType =>
      val sr = src.getStruct(i, st.length)
      val ng = g.addGroup(name)
      var k = 0
      while (k < st.length) {
        if (!sr.isNullAt(k)) addValue(ng, st.fields(k).name,
          st.fields(k).dataType, sr, k)
        k += 1
      }
    case at: org.apache.spark.sql.types.ArrayType =>
      val arr = src.getArray(i)
      val lg = g.addGroup(name)
      var k = 0
      while (k < arr.numElements()) {
        val eg = lg.addGroup("list")
        if (!arr.isNullAt(k)) addValue(eg, "element", at.elementType, arr, k)
        k += 1
      }
    case _: org.apache.spark.sql.types.VariantType =>
      val vv = src.getVariant(i)
      val vg = g.addGroup(name)
      vg.add("metadata", org.apache.parquet.io.api.Binary
        .fromConstantByteArray(vv.getMetadata))
      vg.add("value", org.apache.parquet.io.api.Binary
        .fromConstantByteArray(vv.getValue))
    case mt: org.apache.spark.sql.types.MapType =>
      // MAP-annotated group: one repeated key_value entry per pair —
      // keys are never null (Spark MapData invariant), a null value is
      // an entry with the optional value field unset
      val map = src.getMap(i)
      val keys = map.keyArray(); val vals = map.valueArray()
      val mg = g.addGroup(name)
      var k = 0
      while (k < map.numElements()) {
        val eg = mg.addGroup("key_value")
        addValue(eg, "key", mt.keyType, keys, k)
        if (!vals.isNullAt(k)) addValue(eg, "value", mt.valueType, vals, k)
        k += 1
      }
    case other => sys.error(s"graft-iceberg write: unsupported type $other")
  }

  /** Write one variant value in the v3 SHREDDED encoding: typed scalars
    * land in typed_value.<f>.typed_value, present-but-mistyped fields
    * fall back to typed_value.<f>.value (a verbatim sub-variant slice —
    * it references the top-level metadata dictionary, written as-is),
    * the residual object (minus every shredded field) lands in `value`
    * (omitted when empty), and non-object variants ride `value` whole. */
  private def addShredded(g: org.apache.parquet.example.data.Group,
      name: String, vv: org.apache.spark.unsafe.types.VariantVal,
      fields: Seq[(String, DataType)]): Unit = {
    import org.apache.spark.types.variant.{Variant, VariantUtil}
    val vg = g.addGroup(name)
    vg.add("metadata", org.apache.parquet.io.api.Binary
      .fromConstantByteArray(vv.getMetadata))
    val v = new Variant(vv.getValue, vv.getMetadata)
    if (v.getType != VariantUtil.Type.OBJECT) {
      vg.add("value", org.apache.parquet.io.api.Binary
        .fromConstantByteArray(vv.getValue))
      return
    }
    val tg = vg.addGroup("typed_value")
    fields.foreach { case (fname, fdt) =>
      val f = v.getFieldByKey(fname)
      if (f != null) {
        val fg = tg.addGroup(fname)
        val typedMatch = (fdt, f.getType) match {
          case (LongType, VariantUtil.Type.LONG) => true
          case (DoubleType, VariantUtil.Type.DOUBLE) => true
          case (StringType, VariantUtil.Type.STRING) => true
          case _ => false
        }
        if (typedMatch) fdt match {
          case LongType => fg.add("typed_value", f.getLong)
          case DoubleType => fg.add("typed_value", f.getDouble)
          case _ => fg.add("typed_value", f.getString)
        }
        else fg.add("value", org.apache.parquet.io.api.Binary
          .fromConstantByteArray(f.getValue))
      }
    }
    graft.sources.v2.VariantShred
      .residualValue(v, fields.map(_._1).toSet)
      .foreach(res => vg.add("value", org.apache.parquet.io.api.Binary
        .fromConstantByteArray(res)))
  }

  override def write(record: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i)) {
        if (lakeType(i) != null)
          g.add(schema.fields(i).name,
            org.apache.parquet.io.api.Binary.fromConstantByteArray(
              GraftFormatWriters.lakeEncode(lakeType(i), record, i)))
        else if (shreds.contains(schema.fields(i).name) &&
            schema.fields(i).dataType
              .isInstanceOf[org.apache.spark.sql.types.VariantType])
          addShredded(g, schema.fields(i).name, record.getVariant(i),
            shreds(schema.fields(i).name))
        else addValue(g, schema.fields(i).name, schema.fields(i).dataType,
          record, i)
      }
      i += 1
    }
    writer.write(g)
  }

  override def close(): Unit = writer.close()

  override def dataSize: Long = writer.getDataSize

  /** The writer's own in-memory footer IS what a re-read would parse —
    * per-top-level-column chunk totals, zero file I/O. */
  override def closedColumnSizes: Option[Map[String, Long]] = {
    val byTop = scala.collection.mutable.HashMap.empty[String, Long]
    writer.getFooter.getBlocks.forEach(b => b.getColumns.forEach { c =>
      val top = c.getPath.toArray()(0)
      byTop(top) = byTop.getOrElse(top, 0L) + c.getTotalSize
    })
    Some(byTop.toMap)
  }
}

/** ORC arm: orc-core `Writer` fed vectorized batches — the full type
  * surface (scalars incl. time/uuid/fixed/variant dialects, plus
  * struct/list/map composed to any depth). Rows read back with REAL
  * ordinals via [[graft.sources.OrcPosRead]] (stripe-granular,
  * `RecordReader.getRowNumber`), so MOR position deletes apply to
  * SQL-written ORC exactly like parquet. */
private[v2] class OrcTaskWriter(file: java.io.File, schema: StructType)
    extends GraftPhysicalWriter {
  GraftFormatWriters.requireWritable(schema, "ORC")

  /** Fully recursive ORC type mapping: scalars, struct-of-anything,
    * list-of-anything. */
  private def tdOf(dt: DataType): TypeDescription = dt match {
    case LongType => TypeDescription.createLong()
    case IntegerType => TypeDescription.createInt()
    case DoubleType => TypeDescription.createDouble()
    case FloatType => TypeDescription.createFloat()
    case BooleanType => TypeDescription.createBoolean()
    case StringType => TypeDescription.createString()
    case DateType => TypeDescription.createDate()
    case TimestampType => TypeDescription.createTimestampInstant()
    // spec `timestamp` (tz-naive): ORC's zone-free TIMESTAMP
    case TimestampNTZType => TypeDescription.createTimestamp()
    // spec `time` in the ORC dialect: LONG microseconds from midnight
    // (ORC has no time category; Iceberg's ORC spec stores time as long)
    case _: TimeType => TypeDescription.createLong()
    case BinaryType => TypeDescription.createBinary()
    // ORC decimals are HiveDecimal-backed natively up to the spec's
    // precision 38 ceiling — no wide/narrow split needed
    case d: DecimalType =>
      TypeDescription.createDecimal()
        .withPrecision(d.precision).withScale(d.scale)
    case st: StructType =>
      val n = TypeDescription.createStruct()
      st.fields.foreach(nf => n.addField(nf.name, tdOf(nf.dataType)))
      n
    case at: ArrayType => TypeDescription.createList(tdOf(at.elementType))
    case mt: MapType =>
      TypeDescription.createMap(tdOf(mt.keyType), tdOf(mt.valueType))
    // VARIANT in the ORC dialect: struct<metadata: binary, value:
    // binary> — the same two-binary shape as the parquet encoding
    case _: VariantType => TypeDescription.createStruct()
      .addField("metadata", TypeDescription.createBinary())
      .addField("value", TypeDescription.createBinary())
    case other =>
      sys.error(s"graft-iceberg write: unsupported ORC type $other")
  }

  private val td = {
    val t = TypeDescription.createStruct()
    schema.fields.foreach(f => t.addField(f.name, tdOf(f.dataType)))
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
    case _: TimeType => // micros from midnight (nanos internal)
      vec.asInstanceOf[LongColumnVector].vector(r) = row.getLong(i) / 1000L
      approxBytes += 8
    case DateType => // epoch days, ORC DATE's own representation
      vec.asInstanceOf[LongColumnVector].vector(r) = row.getInt(i).toLong
      approxBytes += 4
    case TimestampType | TimestampNTZType =>
      val us = row.getLong(i) // micros (UTC-adjusted or naive)
      val t = vec.asInstanceOf[TimestampColumnVector]
      // ORC's TimestampTreeWriter derives the stored second as
      // `time / 1000` with TRUNCATING division — `time` must be the
      // FLOOR-second millis alone (no sub-second fraction), or every
      // pre-epoch sub-second value shifts forward a second; nanos
      // carries the full fraction-of-second
      t.time(r) = Math.floorDiv(us, 1000000L) * 1000L
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
    // recursive composites: struct fields set at the SAME vector index,
    // list elements append into the child vector at childCount
    case st: StructType =>
      val sv = vec.asInstanceOf[StructColumnVector]
      val sr = row.getStruct(i, st.length)
      var k = 0
      while (k < st.length) {
        if (sr.isNullAt(k)) {
          sv.fields(k).noNulls = false
          sv.fields(k).isNull(r) = true
        } else setScalar(sv.fields(k), r, st.fields(k).dataType, sr, k)
        k += 1
      }
    case at: ArrayType =>
      val lv = vec.asInstanceOf[ListColumnVector]
      val arr = row.getArray(i)
      val n = arr.numElements()
      val base = lv.childCount
      lv.offsets(r) = base.toLong
      lv.lengths(r) = n.toLong
      lv.childCount = base + n
      lv.child.ensureSize(lv.childCount, true)
      var k = 0
      while (k < n) {
        if (arr.isNullAt(k)) {
          lv.child.noNulls = false
          lv.child.isNull(base + k) = true
        } else setScalar(lv.child, base + k, at.elementType, arr, k)
        k += 1
      }
      approxBytes += 8
    case _: VariantType =>
      val sv = vec.asInstanceOf[StructColumnVector]
      val vv = row.getVariant(i)
      val m = vv.getMetadata; val v = vv.getValue
      sv.fields(0).asInstanceOf[BytesColumnVector].setVal(r, m, 0, m.length)
      sv.fields(1).asInstanceOf[BytesColumnVector].setVal(r, v, 0, v.length)
      approxBytes += m.length + v.length + 8
    case mt: MapType =>
      // MapColumnVector: paired keys/values child vectors sharing one
      // offsets/lengths run, list-shaped — keys never null, null
      // values flag the values child
      val mv = vec.asInstanceOf[MapColumnVector]
      val map = row.getMap(i)
      val keys = map.keyArray(); val vals = map.valueArray()
      val n = map.numElements()
      val base = mv.childCount
      mv.offsets(r) = base.toLong
      mv.lengths(r) = n.toLong
      mv.childCount = base + n
      mv.keys.ensureSize(mv.childCount, true)
      mv.values.ensureSize(mv.childCount, true)
      var k = 0
      while (k < n) {
        setScalar(mv.keys, base + k, mt.keyType, keys, k)
        if (vals.isNullAt(k)) {
          mv.values.noNulls = false
          mv.values.isNull(base + k) = true
        } else setScalar(mv.values, base + k, mt.valueType, vals, k)
        k += 1
      }
      approxBytes += 8
    case other =>
      sys.error(s"graft-iceberg write: unsupported ORC type $other")
  }

  // lake-typed columns in the ORC dialect: uuid normalizes to the
  // CANONICAL lower-case string (so values agree byte-for-byte with the
  // parquet/avro fixed round-trip), fixed[N] validates the length and
  // stays binary
  private val lakeType: Array[String] = GraftFormatWriters.lakeTypeArr(schema)

  override def write(record: InternalRow): Unit = {
    val r = batch.size
    var i = 0
    while (i < schema.length) {
      val vec = batch.cols(i)
      if (record.isNullAt(i)) {
        vec.noNulls = false
        vec.isNull(r) = true
      } else if (lakeType(i) != null) {
        val b =
          if (lakeType(i) == "uuid") GraftFormatWriters.uuidString(
            GraftFormatWriters.uuidBytes(record.getUTF8String(i).toString))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          else GraftFormatWriters.lakeEncode(lakeType(i), record, i)
        vec.asInstanceOf[BytesColumnVector].setVal(r, b, 0, b.length)
        approxBytes += b.length + 4
      } else setScalar(vec, r, schema.fields(i).dataType, record, i)
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

/** AVRO arm: avro-core `DataFileWriter` of GenericRecords — the full
  * type surface (scalars incl. time-micros / uuid-fixed / variant
  * dialects; record/array/map composites to any depth), `["null", T]`
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
    def prim(dt: DataType, path: String): ASchema = dt match {
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
      // spec `timestamp` (tz-naive): avro local-timestamp-micros
      case TimestampNTZType =>
        org.apache.avro.LogicalTypes.localTimestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
      // spec `time`: avro time-micros
      case _: TimeType =>
        org.apache.avro.LogicalTypes.timeMicros()
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
      // recursive composites: record-in-record to any depth (leaf ids
      // ride dotted keys, same bootstrap as the parquet arm's nested
      // groups; record NAMES are path-derived so distinct nesting sites
      // never collide under avro's named-type rule), array of nullable
      // anything
      case st: StructType =>
        val kids = st.fields.map(nf => fieldOf(nf.name,
          prim(nf.dataType, s"$path.${nf.name}"),
          fieldIds.get(s"$path.${nf.name}")))
        ASchema.createRecord(s"${path.replace('.', '_')}_r", null,
          "graft.data", false, java.util.Arrays.asList(kids: _*))
      case at: ArrayType =>
        ASchema.createArray(ASchema.createUnion(
          ASchema.create(ASchema.Type.NULL),
          prim(at.elementType, s"$path.element")))
      // maps, the Iceberg Avro appendix's two encodings: string keys =
      // native avro map of nullable V; non-string keys = array of
      // required-key key_value records with the array carrying
      // `logicalType: map` (avro maps admit only string keys)
      case mt: MapType if mt.keyType == StringType =>
        ASchema.createMap(ASchema.createUnion(
          ASchema.create(ASchema.Type.NULL),
          prim(mt.valueType, s"$path.value")))
      // VARIANT in the avro dialect: a record of the two required
      // binaries, mirroring the parquet group
      case _: VariantType =>
        val mField = new ASchema.Field("metadata",
          ASchema.create(ASchema.Type.BYTES), null,
          null.asInstanceOf[Object])
        val vField = new ASchema.Field("value",
          ASchema.create(ASchema.Type.BYTES), null,
          null.asInstanceOf[Object])
        ASchema.createRecord(s"${path.replace('.', '_')}_variant", null,
          "graft.data", false, java.util.Arrays.asList(mField, vField))
      case mt: MapType =>
        val keyField = new ASchema.Field("key",
          prim(mt.keyType, s"$path.key"), null,
          null.asInstanceOf[Object])
        val valField = new ASchema.Field("value",
          ASchema.createUnion(ASchema.create(ASchema.Type.NULL),
            prim(mt.valueType, s"$path.value")),
          null, ASchema.Field.NULL_DEFAULT_VALUE)
        val kv = ASchema.createRecord(s"${path.replace('.', '_')}_kv",
          null, "graft.data", false,
          java.util.Arrays.asList(keyField, valField))
        val arr = ASchema.createArray(kv)
        arr.addProp("logicalType", "map")
        arr
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
    // lake-typed column → the Iceberg Avro appendix's encodings: uuid =
    // fixed(16) carrying `logicalType: uuid`, fixed[N] = fixed(N); the
    // fixed NAME is column-derived (avro named-type rule)
    def lakeOf(lt: String, name: String): ASchema =
      if (lt == "uuid") {
        val f = ASchema.createFixed(s"${name}_uuid", null, "graft.data", 16)
        f.addProp("logicalType", "uuid")
        f
      }
      // geometry/geography ride plain avro bytes (WKB verbatim);
      // unknown is null-only — bytes that never carry a value
      else if (GeoLake.isGeoType(lt) || lt == "unknown")
        ASchema.create(ASchema.Type.BYTES)
      else ASchema.createFixed(s"${name}_fixed", null, "graft.data",
        GraftFormatWriters.fixedLenOf(lt))
    val lakeArr = GraftFormatWriters.lakeTypeArr(schema)
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      fieldOf(f.name,
        if (lakeArr(i) != null) lakeOf(lakeArr(i), f.name)
        else prim(f.dataType, f.name), fieldIds.get(f.name))
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

  /** `sch` is the value's NON-NULL avro schema (the union branch) —
    * needed to construct named types (records, fixed) and arrays. */
  private def box(dt: DataType, sch: ASchema,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int): AnyRef = dt match {
    case LongType => approxBytes += 8; Long.box(row.getLong(i))
    case IntegerType => approxBytes += 4; Int.box(row.getInt(i))
    case DoubleType => approxBytes += 8; Double.box(row.getDouble(i))
    case FloatType => approxBytes += 4; Float.box(row.getFloat(i))
    case BooleanType => approxBytes += 1; Boolean.box(row.getBoolean(i))
    // lake-typed columns arrive as STRING/BINARY Spark values but the
    // branch schema is `fixed` — encode to the exact byte width
    case StringType if sch.getType == ASchema.Type.FIXED =>
      approxBytes += 16
      new GenericData.Fixed(sch, GraftFormatWriters.uuidBytes(
        row.getUTF8String(i).toString))
    case BinaryType if sch.getType == ASchema.Type.FIXED =>
      val b = row.getBinary(i)
      require(b.length == sch.getFixedSize,
        s"graft-iceberg write: fixed[${sch.getFixedSize}] value has " +
          s"${b.length} bytes")
      approxBytes += b.length
      new GenericData.Fixed(sch, b)
    case StringType =>
      val s = row.getUTF8String(i).toString
      approxBytes += s.length + 4; s
    case DateType => approxBytes += 4; Int.box(row.getInt(i)) // epoch days
    case TimestampType => approxBytes += 8; Long.box(row.getLong(i)) // µs
    case TimestampNTZType =>
      approxBytes += 8; Long.box(row.getLong(i)) // naive µs
    case _: TimeType =>
      approxBytes += 8; Long.box(row.getLong(i) / 1000L) // nanos→µs
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
      new GenericData.Fixed(sch,
        GraftFormatWriters.signExtend(
          row.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue(), len))
    // recursive composites
    case st: StructType =>
      val sr = row.getStruct(i, st.length)
      val rec = new GenericData.Record(sch)
      var k = 0
      while (k < st.length) {
        if (!sr.isNullAt(k))
          rec.put(k, box(st.fields(k).dataType,
            branchOf(sch.getFields.get(k)), sr, k))
        k += 1
      }
      rec
    case at: ArrayType =>
      val arr = row.getArray(i)
      val n = arr.numElements()
      val elemSch = nonNull(sch.getElementType)
      val out = new GenericData.Array[AnyRef](n, sch)
      var k = 0
      while (k < n) {
        out.add(if (arr.isNullAt(k)) null
          else box(at.elementType, elemSch, arr, k))
        k += 1
      }
      out
    case _: VariantType =>
      val vv = row.getVariant(i)
      approxBytes += vv.getMetadata.length + vv.getValue.length + 8
      val rec = new GenericData.Record(sch)
      rec.put(0, java.nio.ByteBuffer.wrap(vv.getMetadata))
      rec.put(1, java.nio.ByteBuffer.wrap(vv.getValue))
      rec
    case mt: MapType if sch.getType == ASchema.Type.MAP =>
      // string-key fast path: the native avro map
      val map = row.getMap(i)
      val keys = map.keyArray(); val vals = map.valueArray()
      val valSch = nonNull(sch.getValueType)
      val n = map.numElements()
      val out = new java.util.HashMap[String, AnyRef](n * 2)
      var k = 0
      while (k < n) {
        out.put(keys.getUTF8String(k).toString,
          if (vals.isNullAt(k)) null else box(mt.valueType, valSch, vals, k))
        k += 1
      }
      out
    case mt: MapType =>
      // non-string keys: the logicalType-"map" array of key_value
      // records (key required, value nullable)
      val map = row.getMap(i)
      val keys = map.keyArray(); val vals = map.valueArray()
      val kvSch = sch.getElementType
      val keySch = nonNull(kvSch.getFields.get(0).schema())
      val valSch = branchOf(kvSch.getFields.get(1))
      val n = map.numElements()
      val out = new GenericData.Array[AnyRef](n, sch)
      var k = 0
      while (k < n) {
        val rec = new GenericData.Record(kvSch)
        rec.put(0, box(mt.keyType, keySch, keys, k))
        if (!vals.isNullAt(k))
          rec.put(1, box(mt.valueType, valSch, vals, k))
        out.add(rec)
        k += 1
      }
      out
    case other =>
      sys.error(s"graft-iceberg write: unsupported AVRO type $other")
  }

  /** A `["null", T]` union's T; any other schema unchanged. */
  private def nonNull(s: ASchema): ASchema =
    if (s.getType != ASchema.Type.UNION) s
    else {
      val ts = s.getTypes
      (0 until ts.size).map(ts.get)
        .filterNot(_.getType == ASchema.Type.NULL).head
    }

  /** A field's non-null branch (fields are `["null", T]` unions). */
  private def branchOf(f: ASchema.Field): ASchema = {
    val ts = f.schema().getTypes
    (0 until ts.size).map(ts.get)
      .filterNot(_.getType == ASchema.Type.NULL).head
  }

  // per-column non-null branch schemas, resolved once
  private val branches: Array[ASchema] =
    schema.fields.indices.map(i => branchOf(avroSchema.getFields.get(i))).toArray

  override def write(record: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < schema.length) {
      if (!record.isNullAt(i))
        rec.put(i, box(schema.fields(i).dataType, branches(i), record, i))
      i += 1
    }
    writer.append(rec)
  }

  override def close(): Unit = writer.close()

  override def dataSize: Long = approxBytes
}
