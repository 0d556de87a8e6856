package graft.multimodal

/** REAL zero-dependency media codecs: binary PPM (P6) images and 16-bit
  * PCM WAV audio — the two formats decodable byte-exactly with nothing
  * but the JDK. They replace [[Multimodal.FakeCodec]] wherever the
  * payload actually IS one of these formats (content-sniffed by magic
  * bytes); containers without in-sandbox decoders (JPEG, MP4, ...) still
  * fall back to the deterministic stub, so the partition-wise batched
  * plumbing is identical for real and stubbed media.
  *
  * Both decoders are strict enough to be trustworthy fixtures (maxval
  * must be 255, WAV must be PCM-16) and lenient where real files vary
  * (PPM header comments, WAV chunk padding and unknown chunks).
  */
object RealCodec {

  // ---- PPM (P6) ---------------------------------------------------------

  /** Decoded 8-bit RGB image, row-major interleaved. */
  case class Image(width: Int, height: Int, rgb: Array[Byte])

  def isPpm(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 'P' && b(1) == '6' &&
      (b(2) == ' ' || b(2) == '\t' || b(2) == '\n' || b(2) == '\r' || b(2) == '#')

  /** Parse a binary P6 PPM: "P6" <w> <h> <maxval> <1 ws byte> <raw RGB>.
    * Header tokens may be separated by any whitespace and '#' comments. */
  def decodePpm(bytes: Array[Byte]): Image = {
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"malformed PPM header at byte $i")
      // accumulate in LONG with a cap: an Int accumulator wraps on
      // crafted headers (4294967297 -> 1), laundering absurd dimensions
      // PAST the raster-size guard below
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        require(v <= Int.MaxValue, "PPM header number overflows Int")
        i += 1
      }
      v.toInt
    }
    val w = int(); val h = int(); val maxval = int()
    require(w > 0 && h > 0, s"non-positive PPM dimensions: ${w}x$h")
    require(maxval == 255, s"only 8-bit PPM supported (maxval 255), got $maxval")
    i += 1 // exactly ONE whitespace byte separates the header from the raster
    // raster size in LONG: 50000x28634 wraps Int and would bypass the
    // truncation check with garbage dimensions
    val n = w.toLong * h * 3
    require(n <= Int.MaxValue, s"PPM raster too large: ${w}x$h")
    require(bytes.length >= i + n, s"truncated PPM raster: need $n bytes")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, i, i + n.toInt))
  }

  /** Re-encode to canonical P6 bytes ("P6\nW H\n255\n" + raster). */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor downscale to fit inside maxDim x maxDim (identity
    * when already within bounds). Pixel (x,y) of the target samples
    * source (x*sw/tw, y*sh/th) — pure integer index math. */
  def resizeNearest(img: Image, maxDim: Int): Image = {
    val m = math.max(img.width, img.height)
    if (m <= maxDim) img
    else {
      val tw = math.max(1, img.width * maxDim / m)
      val th = math.max(1, img.height * maxDim / m)
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * img.height / th
        var x = 0
        while (x < tw) {
          val sx = x * img.width / tw
          val s = (sy * img.width + sx) * 3
          val d = (y * tw + x) * 3
          out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
          x += 1
        }
        y += 1
      }
      Image(tw, th, out)
    }
  }

  /** 8-dim image feature: per-channel mean and max (6), then the aspect
    * shares w/(w+h), h/(w+h) — all exact integer sums before the final
    * divisions. */
  def imageFeatures(img: Image): Array[Float] = {
    val sums = new Array[Long](3)
    val maxs = new Array[Int](3)
    var i = 0
    while (i < img.rgb.length) {
      val c = i % 3
      val v = img.rgb(i) & 0xFF
      sums(c) += v
      if (v > maxs(c)) maxs(c) = v
      i += 1
    }
    val px = math.max(img.width * img.height, 1).toFloat
    val wh = math.max(img.width + img.height, 1).toFloat
    Array(
      sums(0) / px / 255f, sums(1) / px / 255f, sums(2) / px / 255f,
      maxs(0) / 255f, maxs(1) / 255f, maxs(2) / 255f,
      img.width / wh, img.height / wh)
  }

  // ---- WAV (RIFF, PCM 16-bit) -------------------------------------------

  /** Decoded PCM audio: interleaved 16-bit samples. */
  case class Wav(channels: Int, sampleRate: Int, samples: Array[Short])

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  /** Walk the RIFF chunk list: `fmt ` must declare PCM (format 1) at 16
    * bits; `data` holds the interleaved little-endian samples. Unknown
    * chunks are skipped; chunk bodies are padded to even length. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(isWav(bytes), "not a RIFF/WAVE file")
    var channels = 0; var rate = 0
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = le32(bytes, i + 4)
      val body = i + 8
      require(size >= 0 && body + size <= bytes.length, s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val fmt = le16(bytes, body)
          require(fmt == 1, s"only PCM WAV supported (format 1), got $fmt")
          channels = le16(bytes, body + 2)
          rate = le32(bytes, body + 4)
          val bits = le16(bytes, body + 14)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          samples = new Array[Short](size / 2)
          var j = 0
          while (j < samples.length) {
            samples(j) = le16(bytes, body + j * 2).toShort; j += 1
          }
        case _ => () // LIST, fact, cue, ... — skipped
      }
      i = body + size + (size & 1)
    }
    require(samples != null, "no data chunk")
    require(channels > 0, "no fmt chunk before data was consumed")
    Wav(channels, rate, samples)
  }

  /** Canonical 44-byte-header PCM-16 WAV encoding (fixture writer). */
  def encodeWav(w: Wav): Array[Byte] = {
    val dataLen = w.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(w.channels.toShort).putInt(w.sampleRate)
      .putInt(w.sampleRate * w.channels * 2).putShort((w.channels * 2).toShort)
      .putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    w.samples.foreach(out.putShort)
    out.array()
  }

  /** 8-dim audio feature: mean |amp|, max |amp|, zero-crossing rate,
    * channel count (/8), sample rate (/96kHz), then zeros. */
  def audioFeatures(w: Wav): Array[Float] = {
    var sumAbs = 0L; var maxAbs = 0L; var crossings = 0L
    var i = 0
    while (i < w.samples.length) {
      val v = w.samples(i).toLong
      val a = math.abs(v)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      if (i > 0 && ((v >= 0) != (w.samples(i - 1) >= 0))) crossings += 1
      i += 1
    }
    val n = math.max(w.samples.length, 1).toFloat
    Array(sumAbs / n / 32768f, maxAbs / 32768f, crossings / n,
      w.channels / 8f, w.sampleRate / 96000f, 0f, 0f, 0f)
  }
}
