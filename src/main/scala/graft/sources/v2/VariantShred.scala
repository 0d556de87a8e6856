package graft.sources.v2

import org.apache.spark.sql.types._
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Iceberg-v3 VARIANT SHREDDING (parquet): declared extraction paths of
  * a variant column are materialized as TYPED subcolumns alongside the
  * binary pair, per-file bounds are recorded for each shredded field,
  * and the connector scan prunes files on `variant_get` predicates —
  * turning a semi-structured predicate from a full-scan residual into
  * manifest-level file skipping.
  *
  * Declaration: `graft.variant-shred.<column> = 'mon:bigint,tag:string'`
  * (top-level object fields; types bigint | double | string).
  *
  * Physical encoding (the v3 shredded parquet shape):
  * {{{
  * optional group doc {
  *   required binary metadata;        // the variant metadata dictionary
  *   optional binary value;           // residual: the object MINUS the
  *                                    // shredded fields (absent if none
  *                                    // remain, or the whole variant
  *                                    // when it is not an object)
  *   optional group typed_value {
  *     optional group mon {
  *       optional binary value;       // fallback: present but mistyped
  *       optional int64 typed_value;  // the spec's typed encoding
  *     }
  *     ...
  *   }
  * }
  * }}}
  * Shredded fields never appear in the residual `value` (the spec's
  * shredding rule); field-level `value` slices reference the TOP-LEVEL
  * metadata dictionary, which is written verbatim, so no id remapping
  * is ever needed. Readers reassemble the full variant losslessly.
  *
  * Pruning semantics: each declared path also surfaces as a metadata
  * column `_shred_<col>_<field>` whose value is EXACTLY
  * `variant_get(col, '$.<field>', '<type>')` with try-semantics, and
  * [[VariantShredPrune]] rewrites such predicates to ALSO compare the
  * metadata column — a plain column comparison the scan builder pushes
  * and prunes on recorded bounds. Bounds are recorded with the SAME
  * cast semantics, so they conservatively cover every value the
  * predicate can observe. */
private[graft] object VariantShred {

  val PropPrefix = "graft.variant-shred."
  val MetaPrefix = "_shred_"
  /** Synthetic stat-field id base for shredded paths — far above the
    * positional column ids and any realistic `pushdown.fields`
    * declaration. */
  val StatIdBase = 5000

  final case class Decl(col: String, field: String, dt: DataType,
      statId: Int) {
    def metaName: String = s"${MetaPrefix}${col}_$field"
    def path: String = s"$$.$field"
  }

  private def typeOf(s: String): DataType = s.trim.toLowerCase match {
    case "bigint" | "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case other => sys.error(
      s"graft-iceberg: variant-shred type must be bigint|double|string, " +
        s"got '$other'")
  }

  /** Parse every `graft.variant-shred.<col>` property. Stat ids are
    * assigned from the PROPERTIES ALONE (columns sorted by name, then
    * declaration order within a column) — schema-independent, so a
    * writer seeing a projected/extended write schema and the scan
    * seeing the table schema always key bounds under the same ids.
    * Declarations are validated against `schema` for the columns it
    * contains; declarations naming absent columns are dropped. */
  def declsOf(props: Map[String, String],
      schema: StructType): Seq[Decl] =
    rawDecls(props).filter { d =>
      schema.fields.find(_.name == d.col) match {
        case None => false
        case Some(f) =>
          require(f.dataType.isInstanceOf[VariantType],
            s"graft-iceberg: graft.variant-shred.${d.col} declared but " +
              s"${d.col} is ${f.dataType.sql}, not VARIANT")
          true
      }
    }

  /** The schema-FREE parse (the scan's stats decode uses this — it must
    * not force the table schema, whose inference depends on the scan
    * state). A declaration naming an absent column yields a stat field
    * whose bounds simply never record. */
  def rawDecls(props: Map[String, String]): Seq[Decl] = {
    val byCol = props.collect {
      case (k, v) if k.startsWith(PropPrefix) =>
        k.stripPrefix(PropPrefix) -> v
    }
    if (byCol.isEmpty) return Nil
    var next = StatIdBase
    byCol.keys.toSeq.sorted.flatMap { col =>
      byCol(col).split(',').toSeq.filter(_.nonEmpty).map { ent =>
        val Array(path, tpe) = ent.split(':')
        val field = path.trim.stripPrefix("$.")
        require(field.nonEmpty && !field.contains('.') &&
          !field.contains('['),
          s"graft-iceberg: variant-shred path '$path' must be a " +
            "top-level object field ($.name)")
        val d = Decl(col, field, typeOf(tpe), next)
        next += 1
        d
      }
    }
  }

  /** The extraction a shred metadata column serves — EXACTLY
    * `variant_get(col, '$.field', type)` with try-semantics (null on a
    * failed cast), the contract [[VariantShredPrune]]'s rewrite and the
    * writer's bounds both depend on. Returns Spark-internal values
    * (Long / Double / UTF8String) or null. */
  def extract(vv: VariantVal, field: String, dt: DataType): Any = {
    if (vv == null) return null
    val v = new Variant(vv.getValue, vv.getMetadata)
    if (v.getType != VariantUtil.Type.OBJECT) return null
    val f = v.getFieldByKey(field)
    if (f == null) return null
    import org.apache.spark.sql.catalyst.expressions.variant.{VariantCastArgs, VariantGet}
    // SESSION timezone, like the in-query variant_get the pruning twin
    // must agree with row-for-row (a UTC pin would mis-render
    // timestamp-valued fields cast to string under other sessions)
    val tz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    VariantGet.cast(f, dt,
      VariantCastArgs(failOnError = false, Some(tz),
        org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(tz)))
  }

  /** The STRICT extraction the writer's bounds use: the value only when
    * its variant type matches the declared type exactly (the same rule
    * [[GraftTable]] shredding writes typed_value under) — None when the
    * field is absent, Some(null) when present but mistyped. Bounds built
    * from strict values only are timezone-free and error-free, so
    * pruning can never mask a strict variant_get cast error or a
    * session-timezone rendering difference. */
  def extractStrict(vv: VariantVal, field: String,
      dt: DataType): Option[Any] = {
    if (vv == null) return None
    val v = new Variant(vv.getValue, vv.getMetadata)
    if (v.getType != VariantUtil.Type.OBJECT) return None
    val f = v.getFieldByKey(field)
    if (f == null) return None
    Some((dt, f.getType) match {
      case (LongType, VariantUtil.Type.LONG) => f.getLong
      case (DoubleType, VariantUtil.Type.DOUBLE) => f.getDouble
      case (StringType, VariantUtil.Type.STRING) => f.getString
      case _ => null
    })
  }

  // ---- variant binary plumbing (spec encoding, public constants) ----

  private def sizeNeeded(maxVal: Long): Int =
    if (maxVal <= 0xFF) 1 else if (maxVal <= 0xFFFF) 2
    else if (maxVal <= 0xFFFFFF) 3 else 4

  /** Encode an OBJECT value from (dictionaryId, valueBytes) entries —
    * already sorted by key name (the spec's field order). Entries
    * reference the shared top-level metadata dictionary. */
  def encodeObject(entries: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val n = entries.length
    val dataSize = entries.iterator.map(_._2.length.toLong).sum
    val largeSize = n > 0xFF
    val idSize = sizeNeeded(entries.map(_._1.toLong).maxOption.getOrElse(0L))
    val offsetSize = sizeNeeded(dataSize)
    val headerSize = 1 + (if (largeSize) 4 else 1) +
      n * idSize + (n + 1) * offsetSize
    val out = new Array[Byte](headerSize + dataSize.toInt)
    out(0) = VariantUtil.objectHeader(largeSize, idSize, offsetSize)
    VariantUtil.writeLong(out, 1, n.toLong, if (largeSize) 4 else 1)
    val idStart = 1 + (if (largeSize) 4 else 1)
    val offStart = idStart + n * idSize
    var dataOff = 0L
    var i = 0
    while (i < n) {
      VariantUtil.writeLong(out, idStart + i * idSize,
        entries(i)._1.toLong, idSize)
      VariantUtil.writeLong(out, offStart + i * offsetSize, dataOff,
        offsetSize)
      val b = entries(i)._2
      System.arraycopy(b, 0, out, headerSize + dataOff.toInt, b.length)
      dataOff += b.length
      i += 1
    }
    VariantUtil.writeLong(out, offStart + n * offsetSize, dataOff, offsetSize)
    out
  }

  /** key → dictionary id from a variant METADATA binary (spec layout:
    * header byte with offset size in bits 6-7, dictionary size, N+1
    * offsets, concatenated key bytes). */
  def metadataKeyIds(metadata: Array[Byte]): Map[String, Int] = {
    def readLE(pos: Int, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v |= (metadata(pos + k) & 0xFFL) << (8 * k); k += 1 }
      v
    }
    val offsetSize = ((metadata(0) >> 6) & 0x3) + 1
    val dictSize = readLE(1, offsetSize).toInt
    val offsetsStart = 1 + offsetSize
    val bytesStart = offsetsStart + (dictSize + 1) * offsetSize
    (0 until dictSize).map { i =>
      val off = readLE(offsetsStart + i * offsetSize, offsetSize).toInt
      val end = readLE(offsetsStart + (i + 1) * offsetSize, offsetSize).toInt
      new String(metadata, bytesStart + off, end - off,
        java.nio.charset.StandardCharsets.UTF_8) -> i
    }.toMap
  }

  /** Encode one reassembled typed scalar as variant value bytes. */
  def encodeScalar(v: Any, dt: DataType): Array[Byte] = dt match {
    case LongType =>
      val out = new Array[Byte](9)
      out(0) = VariantUtil.primitiveHeader(VariantUtil.INT8)
      VariantUtil.writeLong(out, 1, v.asInstanceOf[Long], 8)
      out
    case DoubleType =>
      val out = new Array[Byte](9)
      out(0) = VariantUtil.primitiveHeader(VariantUtil.DOUBLE)
      VariantUtil.writeLong(out, 1,
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
      out
    case StringType =>
      val bytes = v.toString.getBytes("UTF-8")
      if (bytes.length < VariantUtil.MAX_SHORT_STR_SIZE) {
        val out = new Array[Byte](1 + bytes.length)
        out(0) = VariantUtil.shortStrHeader(bytes.length)
        System.arraycopy(bytes, 0, out, 1, bytes.length)
        out
      } else {
        val out = new Array[Byte](5 + bytes.length)
        out(0) = VariantUtil.primitiveHeader(VariantUtil.LONG_STR)
        VariantUtil.writeLong(out, 1, bytes.length.toLong, 4)
        System.arraycopy(bytes, 0, out, 5, bytes.length)
        out
      }
    case other => sys.error(s"graft-iceberg: unshreddable type $other")
  }

  /** WRITER side: the residual object (the variant minus its shredded
    * fields), or None when nothing remains. `v` must be an OBJECT. */
  def residualValue(v: Variant, shredded: Set[String]): Option[Array[Byte]] = {
    val kept = (0 until v.objectSize()).flatMap { i =>
      val f = v.getFieldAtIndex(i)
      if (shredded(f.key)) None
      else Some((f.key, v.getDictionaryIdAtIndex(i), f.value.getValue))
    }
    if (kept.isEmpty) None
    else Some(encodeObject(kept.sortBy(_._1).map(e => (e._2, e._3))))
  }

  /** READER side: reassemble the full variant value from the residual
    * plus the shredded fields present in this row. `typed` carries
    * (field, either typed scalar Right((value, dt)) or raw variant
    * bytes Left(bytes)). */
  def reassemble(metadata: Array[Byte], residual: Option[Array[Byte]],
      typed: Seq[(String, Either[Array[Byte], (Any, DataType)])])
      : VariantVal = {
    if (typed.isEmpty)
      return new VariantVal(
        residual.getOrElse(encodeObject(Nil)), metadata)
    val keyIds = metadataKeyIds(metadata)
    val fromTyped = typed.map { case (field, e) =>
      val bytes = e match {
        case Left(raw) => raw
        case Right((v, dt)) => encodeScalar(v, dt)
      }
      (field, keyIds.getOrElse(field, sys.error(
        s"graft-iceberg: shredded field '$field' missing from the " +
          "variant metadata dictionary")), bytes)
    }
    val fromResidual = residual.toSeq.flatMap { res =>
      val rv = new Variant(res, metadata)
      (0 until rv.objectSize()).map { i =>
        val f = rv.getFieldAtIndex(i)
        (f.key, rv.getDictionaryIdAtIndex(i), f.value.getValue)
      }
    }
    val all = (fromTyped ++ fromResidual).sortBy(_._1)
    new VariantVal(encodeObject(all.map(e => (e._2, e._3))), metadata)
  }
}
