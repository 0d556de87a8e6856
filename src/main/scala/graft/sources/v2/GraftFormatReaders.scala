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
  * SQL. The full type surface rides: scalars (incl. the time / uuid /
  * fixed / variant dialects) plus struct/list/map composites to any
  * depth; struct leaves resolve by name, then by recorded rename
  * alias, at every nesting level.
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
    * null; a STRUCT column yields an `Array[Any]` of its leaf values in
    * file leaf order, an ARRAY column an `Array[Any]` of its elements,
    * a MAP column a two-element `Array[Any](keys, values)` of parallel
    * `Array[Any]`s — all recursively), index-aligned with [[names]]. */
  def iterator: Iterator[Array[Any]]
  /** Recursive file-type descriptor per column — how the consuming
    * reader resolves TABLE leaves against this file's composite layout
    * at every nesting level. */
  def nodes: Seq[GraftFormatReaders.GNode]
  def close(): Unit
}

private[graft] object GraftFormatReaders {

  /** File-side shape of one column, recursive: the name catalog the
    * row assembler resolves table fields (and their rename aliases)
    * against, level by level. */
  sealed trait GNode
  case object GLeaf extends GNode
  final case class GStructNode(names: Seq[String], kids: Seq[GNode])
    extends GNode
  final case class GListNode(elem: GNode) extends GNode
  final case class GMapNode(key: GNode, value: GNode) extends GNode

  def open(path: String, fileFormat: String): GraftNamedRows =
    fileFormat match {
      case "ORC" => new OrcNamedRows(path)
      case "AVRO" => new AvroNamedRows(path)
      case other => sys.error(
        s"graft-iceberg: no row reader for file_format $other at $path")
    }

  /** Is this avro ARRAY the Iceberg Avro appendix's non-string-key MAP
    * encoding — an array of key/value records carrying
    * `logicalType: map`? Shared by this reader and
    * [[graft.sources.AvroDataRead]] so the two arms can never drift. */
  private[graft] def isAvroKvMap(s: org.apache.avro.Schema): Boolean =
    s.getType == org.apache.avro.Schema.Type.ARRAY &&
      "map" == s.getObjectProp("logicalType") &&
      s.getElementType.getType == org.apache.avro.Schema.Type.RECORD &&
      s.getElementType.getFields.size == 2
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
        // ORC's TreeReader emits time = storedSeconds*1000 + fraction
        // millis, MINUS 1000 when (negative, nanos > 999999) — undo
        // that correction and strip the fraction to recover the exact
        // floor second, then micros from (second, nanos)
        val n = t.nanos(i)
        var ms = t.time(i)
        if (ms < 0 && n > 999999) ms += 1000L
        ((ms - n / 1000000) / 1000L) * 1000000L + n / 1000L
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
        // struct: leaves convert into an Array[Any] in FILE leaf order
        // ([[nodes]] names them), recursively
        import scala.jdk.CollectionConverters._
        val kids = c.getChildren.asScala.toArray.map(extractorOf)
        (v, i) => {
          val sv = v.asInstanceOf[StructColumnVector]
          val vals = new Array[Any](kids.length)
          var k = 0
          while (k < kids.length) { vals(k) = kids(k)(sv.fields(k), i); k += 1 }
          vals
        }
      case LIST =>
        // list: elements convert into an Array[Any], recursively — the
        // child vector indexes by (offset + k)
        val elem = extractorOf(c.getChildren.get(0))
        (v, i) => {
          val lv = v.asInstanceOf[ListColumnVector]
          val off = lv.offsets(i).toInt
          val n = lv.lengths(i).toInt
          val vals = new Array[Any](n)
          var k = 0
          while (k < n) { vals(k) = elem(lv.child, off + k); k += 1 }
          vals
        }
      case MAP =>
        // map: parallel keys/values arrays off the shared offsets run —
        // the neutral Array(keys, values) shape, recursively
        val kEx = extractorOf(c.getChildren.get(0))
        val vEx = extractorOf(c.getChildren.get(1))
        (v, i) => {
          val mv = v.asInstanceOf[MapColumnVector]
          val off = mv.offsets(i).toInt
          val n = mv.lengths(i).toInt
          val ks = new Array[Any](n)
          val vs = new Array[Any](n)
          var k = 0
          while (k < n) {
            ks(k) = kEx(mv.keys, off + k)
            vs(k) = vEx(mv.values, off + k)
            k += 1
          }
          Array[Any](ks, vs)
        }
      case cat => sys.error(
        s"graft-iceberg ORC read: unsupported category $cat — " +
          "scalar/struct/list/map schemas only")
    }
    (vec, row) => {
      val i = if (vec.isRepeating) 0 else row
      if (!vec.noNulls && vec.isNull(i)) null else core(vec, i)
    }
  }

  private val extract = cols.toArray.map(extractorOf)

  private def nodeOf(c: TypeDescription): GraftFormatReaders.GNode =
    c.getCategory match {
      case TypeDescription.Category.STRUCT =>
        GraftFormatReaders.GStructNode(c.getFieldNames.asScala.toSeq,
          c.getChildren.asScala.toSeq.map(nodeOf))
      case TypeDescription.Category.LIST =>
        GraftFormatReaders.GListNode(nodeOf(c.getChildren.get(0)))
      case TypeDescription.Category.MAP =>
        GraftFormatReaders.GMapNode(nodeOf(c.getChildren.get(0)),
          nodeOf(c.getChildren.get(1)))
      case _ => GraftFormatReaders.GLeaf
    }

  override val nodes: Seq[GraftFormatReaders.GNode] = cols.map(nodeOf)

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
      // uuid lake columns (fixed(16) + `logicalType: uuid`) decode to
      // the canonical string; plain fixed(L) to its bytes
      case FIXED =>
        val isUuid = "uuid" == s.getObjectProp("logicalType")
        v =>
          if (v == null) null
          else {
            val b = v.asInstanceOf[org.apache.avro.generic.GenericFixed]
              .bytes()
            if (isUuid) GraftFormatWriters.uuidString(b) else b
          }
      // date (int/date) and timestamptz (long/timestamp-micros) arrive
      // as raw Int days / Long micros — the internal representations the
      // row assembler wants, so identity covers them below
      case RECORD =>
        // record: leaf values in FILE leaf order, recursively
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
      case ARRAY if GraftFormatReaders.isAvroKvMap(s) =>
        // non-string-key map: logicalType-"map" array of key_value
        // records — decode into the neutral Array(keys, values) shape
        val kvFields = s.getElementType.getFields
        val kConv = converterOf(kvFields.get(0).schema())
        val vConv = converterOf(kvFields.get(1).schema())
        v =>
          if (v == null) null
          else {
            val coll = v.asInstanceOf[java.util.Collection[_]]
            val ks = new Array[Any](coll.size)
            val vs = new Array[Any](coll.size)
            val it = coll.iterator()
            var k = 0
            while (it.hasNext) {
              val rec = it.next().asInstanceOf[GenericRecord]
              ks(k) = kConv(rec.get(0)); vs(k) = vConv(rec.get(1))
              k += 1
            }
            Array[Any](ks, vs)
          }
      case ARRAY =>
        // array: elements into an Array[Any], recursively
        val elem = converterOf(s.getElementType)
        v =>
          if (v == null) null
          else {
            val coll = v.asInstanceOf[java.util.Collection[_]]
            val vals = new Array[Any](coll.size)
            val it = coll.iterator()
            var k = 0
            while (it.hasNext) { vals(k) = elem(it.next()); k += 1 }
            vals
          }
      case MAP =>
        // string-key map: avro's native map (Utf8 keys) into the
        // neutral Array(keys, values) shape
        val vConv = converterOf(s.getValueType)
        v =>
          if (v == null) null
          else {
            val m = v.asInstanceOf[java.util.Map[_, _]]
            val ks = new Array[Any](m.size)
            val vs = new Array[Any](m.size)
            val it = m.entrySet().iterator()
            var k = 0
            while (it.hasNext) {
              val e = it.next()
              ks(k) = e.getKey.toString; vs(k) = vConv(e.getValue)
              k += 1
            }
            Array[Any](ks, vs)
          }
      case _ => identity
    }
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else (0 until s.getTypes.size).map(s.getTypes.get)
      .filterNot(_.getType == Schema.Type.NULL).head

  private val conv = fields.toArray.map(f => converterOf(f.schema()))

  private def nodeOf(s: Schema): GraftFormatReaders.GNode = {
    val u = unwrap(s)
    u.getType match {
      case Schema.Type.RECORD =>
        GraftFormatReaders.GStructNode(
          u.getFields.asScala.toSeq.map(_.name),
          u.getFields.asScala.toSeq.map(f => nodeOf(f.schema())))
      case Schema.Type.ARRAY if GraftFormatReaders.isAvroKvMap(u) =>
        val kv = u.getElementType.getFields
        GraftFormatReaders.GMapNode(nodeOf(kv.get(0).schema()),
          nodeOf(kv.get(1).schema()))
      case Schema.Type.ARRAY =>
        GraftFormatReaders.GListNode(nodeOf(u.getElementType))
      case Schema.Type.MAP =>
        GraftFormatReaders.GMapNode(GraftFormatReaders.GLeaf,
          nodeOf(u.getValueType))
      case _ => GraftFormatReaders.GLeaf
    }
  }

  override val nodes: Seq[GraftFormatReaders.GNode] =
    fields.map(f => nodeOf(f.schema()))

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

  // `_geo_<col>_<edge>` metadata columns, parsed per row from the WKB
  // source (these readers decode every file column, so the source is
  // always at hand)
  private val geoOf: Array[(String, Int)] =
    required.fields.map { f =>
      part.geoCols.iterator.flatMap { c =>
        GeoLake.Suffixes.zipWithIndex.collectFirst {
          case (sfx, k) if f.name == GeoLake.metaName(c, sfx) => (c, k)
        }
      }.nextOption().orNull
    }
  // `_shred_<col>_<field>` metadata columns: ORC/AVRO data files of a
  // shred-declared table are never shredded physically, but the
  // pruning twin VariantShredPrune ands onto variant_get predicates is
  // evaluated ROW-LEVEL here too — a reader that null-filled it would
  // silently drop every matching row. (srcColIdx, converter, field, dt).
  private val shredOf: Array[(Int, Any => Any, String, org.apache.spark.sql.types.DataType)] =
    required.fields.map { f =>
      part.shreds.collectFirst { case (meta, col, field, ddl)
          if meta == f.name && nameIdx.contains(col) =>
        val ci = nameIdx(col)
        (ci,
          convOf(StructField(col, org.apache.spark.sql.types.VariantType),
            rows.nodes(ci)),
          field,
          org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseDataType(ddl))
      }.orNull
    }
  private val isMeta: Array[Boolean] =
    required.fields.zipWithIndex.map { case (f, i) =>
      f.name == GraftTable.FileMetadataColumn ||
      f.name == GraftTable.PosMetadataColumn ||
      f.name == GraftTable.SpecIdMetadataColumn ||
      f.name == GraftTable.PartitionMetadataColumn ||
      geoOf(i) != null || shredOf(i) != null
    }
  private val isPos: Array[Boolean] =
    required.fields.map(_.name == GraftTable.PosMetadataColumn)
  private val isSpecId: Array[Boolean] =
    required.fields.map(_.name == GraftTable.SpecIdMetadataColumn)
  private val isPartMeta: Array[Boolean] =
    required.fields.map(_.name == GraftTable.PartitionMetadataColumn)
  private lazy val partitionMetaValue: Array[Any] =
    required.fields.zipWithIndex.collectFirst {
      case (f, i) if isPartMeta(i) =>
        f.dataType.asInstanceOf[StructType].fields.map { pf =>
          part.pvals.get(pf.name).map { v =>
            (v, pf.dataType) match {
              case (l: Long, LongType) => l
              case (l: Long, DoubleType) => l.toDouble
              case (d: Double, DoubleType) => d
              case (str: String, StringType) =>
                UTF8String.fromString(str): Any
              case (other, _) => other
            }
          }.orNull
        }: Array[Any]
    }.getOrElse(Array.empty)
  // v3 row lineage: materialized non-null value wins, else synthesized
  // (first_row_id + pos / the file's own sequence number) — same rule
  // as the parquet reader
  private val isRowId: Array[Boolean] =
    required.fields.map(_.name == GraftTable.RowIdMetadataColumn)
  private val isLastUpd: Array[Boolean] =
    required.fields.map(_.name == GraftTable.LastUpdatedMetadataColumn)
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

  private def aliasesOf(f: StructField): Seq[String] =
    if (!f.metadata.contains(GraftCatalog.AliasesKey)) Nil
    else f.metadata.getString(GraftCatalog.AliasesKey)
      .split(',').toSeq.filter(_.nonEmpty)

  /** Recursive (file JVM value → Catalyst value) converter for one
    * column, built ONCE per file from the TABLE field and the file's
    * shape descriptor: struct leaves resolve by name then by recorded
    * rename alias at EVERY level (absent = null-fill, the nested
    * schema-evolution rule), arrays convert element-wise, scalars widen
    * per value (int→long, float→double — pre-ALTER files). Never sees
    * null (the caller short-circuits). */
  private def convOf(f: StructField,
      node: GraftFormatReaders.GNode): Any => Any = {
    import GraftFormatReaders._
    f.dataType match {
      case st: StructType =>
        val sn = node match {
          case s: GStructNode => s
          case other => sys.error(s"graft-iceberg: table column ${f.name} " +
            s"is a struct but the file holds $other")
        }
        val idx = sn.names.zipWithIndex.toMap
        val leafAt: Array[Int] = st.fields.map(nf =>
          idx.get(nf.name).orElse(aliasesOf(nf)
            .collectFirst { case a if idx.contains(a) => idx(a) })
            .getOrElse(-1))
        val kid: Array[Any => Any] = st.fields.zipWithIndex.map {
          case (nf, k) =>
            if (leafAt(k) < 0) null else convOf(nf, sn.kids(leafAt(k)))
        }
        v => {
          val leaves = v.asInstanceOf[Array[Any]]
          val out = new GenericInternalRow(st.length)
          var k = 0
          while (k < st.length) {
            val lv = if (leafAt(k) < 0) null else leaves(leafAt(k))
            out.update(k, if (lv == null) null else kid(k)(lv))
            k += 1
          }
          out
        }
      case at: ArrayType =>
        val en = node match {
          case GListNode(e) => e
          case other => sys.error(s"graft-iceberg: table column ${f.name} " +
            s"is an array but the file holds $other")
        }
        val ec = convOf(StructField("element", at.elementType), en)
        v => {
          val vals = v.asInstanceOf[Array[Any]]
          val out = new Array[Any](vals.length)
          var k = 0
          while (k < vals.length) {
            out(k) = if (vals(k) == null) null else ec(vals(k)); k += 1
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
        }
      case _: org.apache.spark.sql.types.VariantType =>
        // the file holds the two-binary struct (metadata, value)
        val sn = node match {
          case s: GStructNode => s
          case other => sys.error(s"graft-iceberg: table column ${f.name} " +
            s"is a variant but the file holds $other")
        }
        val mi = sn.names.indexOf("metadata")
        val vi = sn.names.indexOf("value")
        require(mi >= 0 && vi >= 0,
          s"graft-iceberg: variant column ${f.name} needs (metadata, value)")
        v => {
          val leaves = v.asInstanceOf[Array[Any]]
          new org.apache.spark.unsafe.types.VariantVal(
            leaves(vi).asInstanceOf[Array[Byte]],
            leaves(mi).asInstanceOf[Array[Byte]])
        }
      case mt: MapType =>
        val mn = node match {
          case m: GMapNode => m
          case other => sys.error(s"graft-iceberg: table column ${f.name} " +
            s"is a map but the file holds $other")
        }
        val kc = convOf(StructField("key", mt.keyType), mn.key)
        val vc = convOf(StructField("value", mt.valueType), mn.value)
        v => {
          val pair = v.asInstanceOf[Array[Any]]
          val ks = pair(0).asInstanceOf[Array[Any]]
          val vs = pair(1).asInstanceOf[Array[Any]]
          val ko = new Array[Any](ks.length)
          val vo = new Array[Any](vs.length)
          var k = 0
          while (k < ks.length) {
            ko(k) = kc(ks(k)) // map keys are never null
            vo(k) = if (vs(k) == null) null else vc(vs(k))
            k += 1
          }
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(ko),
            new org.apache.spark.sql.catalyst.util.GenericArrayData(vo))
        }
      case LongType => {
        case x: Long => x
        case x: Int => x.toLong
        case other => sys.error(s"graft-iceberg: $other as LONG")
      }
      // spec `time`: the files store MICROS from midnight (ORC long
      // dialect / avro time-micros); Spark's internal value is NANOS
      case _: org.apache.spark.sql.types.TimeType =>
        v => v.asInstanceOf[Long] * 1000L
      case DoubleType => {
        case x: Double => x
        case x: Float => x.toDouble
        case other => sys.error(s"graft-iceberg: $other as DOUBLE")
      }
      case StringType => {
        case s: String => UTF8String.fromString(s)
        // uuid lake columns stored as 16 fixed bytes (a file written
        // before the column's dialect normalized to string)
        case b: Array[Byte] =>
          UTF8String.fromString(GraftFormatWriters.uuidString(b))
        case other => sys.error(s"graft-iceberg: $other as STRING")
      }
      case d: DecimalType => v => {
        val dec = org.apache.spark.sql.types.Decimal(
          v.asInstanceOf[java.math.BigDecimal])
        require(dec.changePrecision(d.precision, d.scale),
          s"graft-iceberg: decimal $v does not fit ${d.sql}")
        dec
      }
      // Int / Float / Boolean / Binary / Date (epoch-day Int) /
      // Timestamp (micros Long) arrive as the internal representation
      case _ => identity
    }
  }

  // per-column converters for the projected, file-present columns
  private lazy val colConv: Array[Any => Any] =
    required.fields.zipWithIndex.map { case (f, i) =>
      if (isMeta(i) || colIdx(i) < 0) null
      else convOf(f, rows.nodes(colIdx(i)))
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
      if (isPos(i)) row.setLong(i, rowIdx)
      else if (isSpecId(i)) row.setInt(i, part.specId)
      else if (isPartMeta(i)) row.update(i,
        new GenericInternalRow(partitionMetaValue.clone()))
      else if (geoOf(i) != null) {
        val (srcCol, edge) = geoOf(i)
        val v = nameIdx.get(srcCol).map(current(_)).orNull
        row.update(i,
          if (v == null) null
          else graft.functions.GeoExprs.bboxEdge(
            v.asInstanceOf[Array[Byte]], edge))
      }
      else if (shredOf(i) != null) {
        val (ci, conv, field, dt) = shredOf(i)
        val raw = current(ci)
        row.update(i,
          if (raw == null) null
          else VariantShred.extract(conv(raw)
            .asInstanceOf[org.apache.spark.unsafe.types.VariantVal],
            field, dt))
      }
      else if (isMeta(i)) row.update(i, UTF8String.fromString(path))
      else if (isRowId(i)) {
        val mat = if (colIdx(i) < 0) null else current(colIdx(i))
        row.update(i,
          if (mat != null) Long.box(mat.asInstanceOf[Long])
          else if (part.firstRowId != null)
            Long.box(part.firstRowId.longValue + rowIdx)
          else null)
      } else if (isLastUpd(i)) {
        val mat = if (colIdx(i) < 0) null else current(colIdx(i))
        row.update(i,
          if (mat != null) Long.box(mat.asInstanceOf[Long])
          else Long.box(part.dataSeq))
      }
      else if (colIdx(i) < 0) row.update(i, absentValue(i))
      else {
        val v = current(colIdx(i))
        row.update(i, if (v == null) null else colConv(i)(v))
      }
      i += 1
    }
    row
  }

  override def close(): Unit = rows.close()
}
