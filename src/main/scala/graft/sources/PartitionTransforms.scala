package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg partition transforms (public spec, "Partition Transforms" +
  * "Appendix B: 32-bit Hash Requirements"): the value-level functions a
  * spec-compliant writer applies to source columns to derive partition
  * values, and what a reader needs to interpret a `bucket[N]`/
  * `truncate[W]`/`day`-partitioned table's keys. The reference gets
  * these transparently from its table library when loading partitioned
  * tables; here they are first-class so written layouts can declare and
  * carry real transform specs.
  *
  * Scalar forms run driver-side (fixture writers, spec vectors) and
  * inside closures; Column forms cover every transform for distributed
  * derivation. `day`/`truncate` are plain integer/substring arithmetic;
  * `bucket[N]`'s Murmur3 is NOT Spark's `hash()` (different seed and
  * value serialization), so [[hashLongCol]] UNROLLS the spec hash — an
  * 8-byte input is exactly two mix blocks plus finalization, all 32-bit
  * modular arithmetic — as pure `Column` expressions (`&`, `|`, `^`,
  * shifts, `%`; multiplies split into 16-bit halves so nothing exceeds
  * 2^49 and ANSI overflow never fires). The whole derivation stays
  * inside whole-stage codegen: no UDF, no scalar round trip, row-level
  * hot-path safe.
  */
object PartitionTransforms {

  /** Standard Murmur3 x86 32-bit, seed 0 — the hash the Iceberg spec
    * requires for `bucket[N]` (Appendix B cites murmur3_x86_32). */
  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(4 * i) & 0xff) | ((data(4 * i + 1) & 0xff) << 8) |
        ((data(4 * i + 2) & 0xff) << 16) | ((data(4 * i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    val rem = data.length & 3
    var k1 = 0
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Spec hash of an int/long/date/timestamp value: 8-byte
    * LITTLE-ENDIAN two's-complement (ints hash as longs so `bucket`
    * agrees across int→long type promotion — spec requirement). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  /** Spec hash of a string: murmur3 of its UTF-8 bytes. */
  def hashString(s: String): Int =
    murmur3(s.getBytes(StandardCharsets.UTF_8))

  /** bucket[N] ordinal: (hash & Int.MaxValue) % N. */
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketString(s: String, n: Int): Int = (hashString(s) & Int.MaxValue) % n

  /** Spec hash of a uuid: murmur3 of the 16-byte BIG-ENDIAN encoding
    * (Appendix B — NOT the UTF-8 bytes of the string form). */
  def bucketUuid(s: String, n: Int): Int =
    (murmur3(graft.sources.v2.GraftFormatWriters.uuidBytes(s))
      & Int.MaxValue) % n

  /** truncate[W] on integers: v - (v mod W) with a floor mod, so
    * negatives truncate DOWN (spec: truncate[10](-1) = -10). */
  def truncateLong(v: Long, w: Long): Long = v - java.lang.Math.floorMod(v, w)

  /** truncate[W] on strings: the first W UNICODE CODE POINTS (not UTF-16
    * units — a surrogate pair counts once, spec requirement). */
  def truncateString(s: String, w: Int): String = {
    val n = s.codePointCount(0, s.length)
    if (n <= w) s else s.substring(0, s.offsetByCodePoints(0, w))
  }

  /** day transform: days from the unix epoch of a micros timestamp
    * (floor division — pre-1970 instants land on the earlier day). */
  def dayFromMicros(us: Long): Int =
    java.lang.Math.floorDiv(us, 86400000000L).toInt

  /** hour transform: hours from the unix epoch (floor division). */
  def hourFromMicros(us: Long): Int =
    java.lang.Math.floorDiv(us, 3600000000L).toInt

  /** month transform: months from 1970-01 (spec: month ordinal, so
    * 1970-01 = 0, 1969-12 = -1 — derived from the civil date of the
    * floor DAY, keeping day/month/year mutually consistent). */
  def monthFromMicros(us: Long): Int = {
    val d = java.time.LocalDate.ofEpochDay(java.lang.Math.floorDiv(us, 86400000000L))
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** year transform: years from 1970. */
  def yearFromMicros(us: Long): Int =
    java.time.LocalDate.ofEpochDay(
      java.lang.Math.floorDiv(us, 86400000000L)).getYear - 1970

  // ---- Column forms (codegen-friendly; no UDFs) ----

  /** [[hashLong]] as a native Catalyst expression ([[IcebergHashLong]]):
    * a plain arithmetic unrolling as nested Column expressions would
    * duplicate each step's subtree (mul/rotate reference their argument
    * twice), growing the expression tree — and the serialized task
    * binary — exponentially; the native kernel is one straight-line call
    * inside whole-stage codegen. Signed 32-bit hash, Int-typed. */
  def hashLongCol(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      IcebergHashLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c.cast("long"))))

  /** bucket[N] of an integral column — (hash & Int.MaxValue) % N, the
    * partition value a spec-compliant writer computes per row. */
  def bucketLongCol(c: Column, n: Int): Column =
    (hashLongCol(c).bitwiseAND(lit(0x7fffffff)) % lit(n)).cast("int")

  /** day ordinal of a timestamp/date column (UTC session): integer days
    * from epoch, the value a `day`-partitioned table stores. */
  def dayCol(ts: Column): Column =
    datediff(ts.cast("date"), to_date(lit("1970-01-01")))

  /** hour ordinal of a timestamp column: hours from epoch (floor). */
  def hourCol(ts: Column): Column =
    floor(unix_micros(ts.cast("timestamp")) / lit(3600000000L)).cast("int")

  /** month ordinal of a timestamp/date column: months from 1970-01. */
  def monthCol(ts: Column): Column =
    ((year(ts.cast("date")) - lit(1970)) * lit(12) +
      month(ts.cast("date")) - lit(1)).cast("int")

  /** year ordinal of a timestamp/date column: years from 1970. */
  def yearCol(ts: Column): Column =
    (year(ts.cast("date")) - lit(1970)).cast("int")

  /** truncate[W] of an integral column (floor semantics = `pmod`). */
  def truncateLongCol(c: Column, w: Long): Column =
    (c.cast("long") - pmod(c.cast("long"), lit(w))).cast("long")

  /** truncate[W] of a string column (BMP-safe; `substring` counts UTF-16
    * units — equal to code points for the corpora here, see
    * [[truncateString]] for the exact scalar). */
  def truncateStringCol(c: Column, w: Int): Column = substring(c, 1, w)
}

/** Native kernel for the spec's `bucket[N]` hash: murmur3_x86_32 of a
  * long's 8-byte little-endian form ([[PartitionTransforms.hashLong]]),
  * kept inside whole-stage codegen so partition-value derivation is
  * row-level hot-path safe at any scale. */
case class IcebergHashLong(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_hash_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"iceberg_hash_long requires BIGINT, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PartitionTransforms.hashLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sources.PartitionTransforms$$.MODULE$$.hashLong($c)")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): IcebergHashLong =
    copy(child = newChild)
}
