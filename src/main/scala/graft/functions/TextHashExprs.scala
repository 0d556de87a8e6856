package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-thread MD5 kernels for the text-signature expressions.
  *
  * All signatures (minhash, simhash, winnowing) are PER-DOCUMENT
  * computations: expressing them relationally (explode shingles → hash →
  * groupBy doc) costs a 100×-row explode plus a full shuffle per signature,
  * purely to re-assemble rows that started co-located. These kernels compute
  * the whole signature inside one projection — no explode, no shuffle — which
  * is the shape that survives a 100 TB corpus: embarrassingly parallel
  * map-side work, shuffles reserved for the candidate-pair joins.
  *
  * Hash parity: `hash28(x)` equals the relational
  * `conv(substring(md5(x), 1, 7), 16, 10)` (first 7 hex nibbles of MD5,
  * 28 bits), streamed over the same bytes without the hex-string /
  * concat_ws allocations. Oracle SQL is unchanged.
  *
  * Null contract: a null ELEMENT inside the token array null-propagates the
  * whole signature (kernels return null), mirroring [[LongArrayDot]]; a
  * null array is handled by the expressions' standard null gate.
  */
object TextHashKernels {
  private val SP: Byte = ' '.toByte

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 28 bits (7 hex nibbles) of the digest as a long. */
  private def top28(b: Array[Byte]): Long =
    ((b(0) & 0xffL) << 20) | ((b(1) & 0xffL) << 12) | ((b(2) & 0xffL) << 4) | ((b(3) & 0xffL) >>> 4)

  /** 28-bit MD5 hash of the n-token shingle toks[i..i+n-1] joined by ' ',
    * streamed into the digest (md5(a || ' ' || b) without building the
    * concatenated string). Returns -1 when an element in range is null
    * (negative is impossible for a real hash — used as the null sentinel). */
  private def shingleHash(toks: ArrayData, i: Int, n: Int): Long = {
    val d = md.get(); d.reset()
    var j = 0
    while (j < n) {
      if (toks.isNullAt(i + j)) return -1L
      if (j > 0) d.update(SP)
      d.update(toks.getUTF8String(i + j).getBytes)
      j += 1
    }
    top28(d.digest())
  }

  /** One-pass (n, s1) ingredients of the q187/q200 char-entropy score
    * over the fixed a-z+space alphabet: n = Σ n_c,
    * s1 = Σ n_c · floor(ln(n_c) · 1e6). Replaces 27 per-char
    * regexp_replace length-difference passes with ONE scan of the
    * string; every double op (ln, ·1e6, floor) matches Spark's
    * LOG/FLOOR on the same values, so results are bit-identical.
    * Alphabet chars are single UTF-16 units that surrogates can never
    * equal, so unit counts == codepoint counts. */
  def charEntropyParts(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](27)
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if (ch >= 'a' && ch <= 'z') counts(ch - 'a') += 1L
      else if (ch == ' ') counts(26) += 1L
      i += 1
    }
    var n = 0L
    var s1 = 0L
    var j = 0
    while (j < 27) {
      val c = counts(j)
      if (c > 0L) {
        n += c
        s1 += c * math.floor(math.log(c.toDouble) * 1e6).toLong
      }
      j += 1
    }
    new GenericArrayData(Array(n, s1))
  }

  /** DISTINCT 28-bit hashes of the doc's n-gram shingles, ascending.
    * Matches explode(array_distinct(shingles)) → hash28 with one caveat:
    * distinctness here is keyed on the shingles' top-64-bit MD5 (not the
    * string), so two DIFFERENT shingles in one doc would collapse only on a
    * 64-bit digest collision (P ≈ m²/2⁶⁵ per doc — ~1e-15 at m=200
    * shingles, negligible even at 1e10 docs). Duplicate 28-bit OUTPUT
    * values from distinct shingles are preserved, exactly like the
    * relational shape. Empty array when the doc has < n tokens (such docs
    * produce no rows after explode); null on null tokens. */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](sz - n + 1)
    var m = 0
    var i = 0
    while (i <= sz - n) {
      val d = md.get(); d.reset()
      var j = 0
      var nullTok = false
      while (j < n && !nullTok) {
        if (toks.isNullAt(i + j)) nullTok = true
        else {
          if (j > 0) d.update(SP)
          d.update(toks.getUTF8String(i + j).getBytes)
        }
        j += 1
      }
      if (nullTok) return null
      val b = d.digest()
      val k64 = ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) | ((b(2) & 0xffL) << 40) |
        ((b(3) & 0xffL) << 32) | ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
      if (seen.add(k64)) { out(m) = top28(b); m += 1 }
      i += 1
    }
    val res = java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(res)
    new GenericArrayData(res)
  }

  /** MinHash signature over the doc's 3-gram shingles: mins of
    * `(h * a(j) + b(j)) % p` per permutation j. Distinctness of shingles is
    * irrelevant to a min, so no dedup pass is needed. Returns null when the
    * doc has < n tokens (parity with the explode pipeline, where such docs
    * produce no rows) or when a token is null. */
  def minhashSig(toks: ArrayData, n: Int, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= sz - n) {
      val h = shingleHash(toks, i, n)
      if (h < 0) return null
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Frequency-weighted SimHash over single tokens: bit i of the result is
    * set when `sum(+1/-1 over tokens by bit i of hash28(token)) >= 0`.
    * Null on null tokens. */
  def simhash(toks: ArrayData, bits: Int): java.lang.Long = {
    val counts = new Array[Int](bits)
    val sz = toks.numElements()
    var t = 0
    while (t < sz) {
      val h = shingleHash(toks, t, 1)
      if (h < 0) return null
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var r = 0L
    var i = 0
    while (i < bits) { if (counts(i) >= 0) r |= (1L << i); i += 1 }
    java.lang.Long.valueOf(r)
  }

  /** Winnowing fingerprints: DISTINCT minima of a `w`-wide sliding window
    * over the doc's ORDERED 3-gram shingle-hash sequence, for window starts
    * idx <= L - w (L = number of shingles). Empty array when there are
    * fewer than w shingles; null on null tokens. */
  def winnow(toks: ArrayData, n: Int, w: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Long])
    val L = sz - n + 1
    if (L < w) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](L)
    var i = 0
    while (i < L) {
      h(i) = shingleHash(toks, i, n)
      if (h(i) < 0) return null
      i += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= L - w) {
      var m = h(i)
      var j = i + 1
      while (j < i + w) { if (h(j) < m) m = h(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** hash28 of a string's UTF-8 bytes — value-identical to the relational
    * idiom `CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)` without
    * materializing the 32-char hex string or re-parsing 7 digits of it. */
  def hash28(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    d.update(s.getBytes)
    top28(d.digest())
  }

  /** Content-defined chunks of a text (rsync/LBFS cut rule): cut BEFORE
    * character position i (1-based, i in 2..len-n+1) whenever
    * hash28(substring(text, i, n)) % mask == 0. Returns the chunk strings
    * in document order; the whole doc when no position fires. Value-parity
    * with the relational shape `substring` + `md5` both engines use:
    * positions are CHARACTER positions, the digest runs over the UTF-8
    * bytes of the character window (identical to md5(substring(...)) in
    * DuckDB/Spark), with a byte-indexed fast path when the text is pure
    * ASCII. */
  def cdcChunks(text: UTF8String, n: Int, mask: Int): ArrayData = {
    val numChars = text.numChars()
    val bytes = text.getBytes
    val ascii = bytes.length == numChars
    val starts = new java.util.ArrayList[Integer]()
    starts.add(1)
    var i = 2
    val last = numChars - n + 1
    while (i <= last) {
      val d = md.get(); d.reset()
      if (ascii) d.update(bytes, i - 1, n)
      else d.update(text.substringSQL(i, n).getBytes)
      if ((top28(d.digest()) & (mask - 1)) == 0L) starts.add(i)
      i += 1
    }
    val k = starts.size
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) {
      val s = starts.get(j).intValue()
      val e = if (j + 1 < k) starts.get(j + 1).intValue() else numChars + 1
      out(j) =
        if (ascii) UTF8String.fromBytes(bytes, s - 1, e - s)
        else text.substringSQL(s, e - s)
      j += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait TokenArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def nullable: Boolean = true
}

/** `minhash_sig(tokens)` → array<bigint> of k permutation minima over the
  * doc's n-gram shingles (null when the doc has fewer than n tokens).
  * Whole-stage-codegen-friendly: the generated code is one call into
  * [[TextHashKernels]]. */
case class MinHashSig(child: Expression, n: Int, a: Array[Long], b: Array[Long], p: Long)
    extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(toks: Any): Any =
    TextHashKernels.minhashSig(toks.asInstanceOf[ArrayData], n, a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mh", this, classOf[MinHashSig].getName)
    val r = ctx.freshName("mhRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.kernel($c);
       |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
     """.stripMargin)
  }

  /** Codegen entry point (stable against field reordering). */
  def kernel(toks: ArrayData): ArrayData = TextHashKernels.minhashSig(toks, n, a, b, p)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `shingle_hashes(tokens)` → array<bigint> of the doc's distinct n-gram
  * shingle hash28s, ascending (empty when the doc has < n tokens). The
  * per-row replacement for the explode→concat_ws→md5→conv pipeline: one
  * streamed MD5 pass per row inside whole-stage codegen, no per-shingle
  * string allocation. */
case class ShingleHashes(child: Expression, n: Int) extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(toks: Any): Any =
    TextHashKernels.shingleHashes(toks.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shh", this, classOf[ShingleHashes].getName)
    val r = ctx.freshName("shhRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.kernel($c);
       |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
     """.stripMargin)
  }

  def kernel(toks: ArrayData): ArrayData = TextHashKernels.shingleHashes(toks, n)

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `simhash_sig(tokens)` → frequency-weighted SimHash (long, `bits` wide). */
case class SimHashSig(child: Expression, bits: Int) extends TokenArrayExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(toks: Any): Any =
    TextHashKernels.simhash(toks.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sh", this, classOf[SimHashSig].getName)
    val r = ctx.freshName("shRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long $r = $ref.kernel($c);
       |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
     """.stripMargin)
  }

  def kernel(toks: ArrayData): java.lang.Long = TextHashKernels.simhash(toks, bits)

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** `winnow_fingerprints(tokens)` → array<bigint> of the doc's distinct
  * winnowing window-minima (ascending; order is normalized so downstream
  * explodes are deterministic). */
case class WinnowFingerprints(child: Expression, n: Int, w: Int) extends TokenArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(toks: Any): Any =
    TextHashKernels.winnow(toks.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wf", this, classOf[WinnowFingerprints].getName)
    val r = ctx.freshName("wfRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.kernel($c);
       |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
     """.stripMargin)
  }

  def kernel(toks: ArrayData): ArrayData = TextHashKernels.winnow(toks, n, w)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** `cdc_chunks(text)` → array<string> of the doc's content-defined chunks
  * (cut before position i when hash28(substring(text, i, n)) % mask == 0).
  * The per-row replacement for the explode-positions→md5→collect→zip_with
  * pipeline: one pass per row inside whole-stage codegen, no position
  * explode, no shuffle before the chunk aggregate. `mask` must be a power
  * of two. */
case class CdcChunks(child: Expression, n: Int, mask: Int) extends UnaryExpression {
  require(mask > 0 && (mask & (mask - 1)) == 0, s"mask must be a power of two, got $mask")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextHashKernels.cdcChunks(text.asInstanceOf[UTF8String], n, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdc", this, classOf[CdcChunks].getName)
    val r = ctx.freshName("cdcRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.kernel($c);
       |${ev.value} = $r;
     """.stripMargin)
  }

  def kernel(text: UTF8String): ArrayData = TextHashKernels.cdcChunks(text, n, mask)

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** `hash28(text)` → the engine's 28-bit portable MD5 hash as one codegen'd
  * long-valued expression. Not used directly by query authors — the
  * [[graft.plans.PortableHash28Rewrite]] optimizer rule substitutes it for
  * the relational conv∘substring∘md5 idiom, so portable SQL gets kernel
  * speed automatically. */
case class Hash28(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash28"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextHashKernels.hash28(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("h28", this, classOf[Hash28].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  def kernel(text: UTF8String): Long = TextHashKernels.hash28(text)

  override protected def withNewChildInternal(newChild: Expression): Hash28 =
    copy(child = newChild)
}

/** `char_entropy_parts(text)` → array(n, s1) of the 27-char-alphabet
  * entropy ingredients in one codegen'd pass
  * ([[TextHashKernels.charEntropyParts]]) — the q187/q200 ingest-scoring
  * hot path. */
case class CharEntropyParts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_entropy_parts"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextHashKernels.charEntropyParts(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cep", this, classOf[CharEntropyParts].getName)
    val r = ctx.freshName("cepRes")
    nullSafeCodeGen(ctx, ev, c => s"""
       |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.kernel($c);
       |${ev.value} = $r;
     """.stripMargin)
  }

  def kernel(text: UTF8String): ArrayData =
    TextHashKernels.charEntropyParts(text)

  override protected def withNewChildInternal(newChild: Expression): CharEntropyParts =
    copy(child = newChild)
}

object TextHashExprs {
  def charEntropyParts(text: Column): Column =
    ColumnBridge.column(CharEntropyParts(ColumnBridge.expression(text)))

  def cdcChunks(text: Column, n: Int = 8, mask: Int = 16): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), n, mask))

  def minhashSig(toks: Column, perms: Seq[(Long, Long)], p: Long, n: Int = 3): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(toks), n,
      perms.map(_._1).toArray, perms.map(_._2).toArray, p))

  def shingleHashes(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(toks), n))

  def simhash(toks: Column, bits: Int): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(toks), bits))

  def winnowFingerprints(toks: Column, n: Int = 3, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(toks), n, w))
}
