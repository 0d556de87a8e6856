package graft.multimodal

/** REAL zero-dependency media codecs: binary PPM (P6) and 8-bit
  * truecolor PNG images (byte-exact, hand-rolled), JPEG (via the JDK's
  * own bundled ImageIO reader — lossy format, exact decode of what the
  * file encodes), and 16-bit PCM WAV audio. They replace
  * [[Multimodal.FakeCodec]] wherever the payload actually IS one of
  * these formats (content-sniffed by magic bytes); containers without
  * in-sandbox decoders (MP4, webm, ...) still fall back to the
  * deterministic stub, so the partition-wise batched plumbing is
  * identical for real and stubbed media.
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

  // ---- PNG (8-bit RGB / RGBA, zlib + the five defilter types) -----------

  private val PngSig: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (0 until 8).forall(i => (b(i) & 0xFF) == PngSig(i))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** Decode an 8-bit truecolor PNG (color type 2 RGB or 6 RGBA; RGBA's
    * alpha is dropped after defiltering so features run on color
    * channels) with nothing but `java.util.zip`: chunk walk with CRC32
    * verification, concatenated IDAT → `Inflater`, then the spec's five
    * scanline filters (None/Sub/Up/Average/Paeth) undone in place.
    * Strict by design — bad CRC, truncated raster, absurd dimensions,
    * palette/16-bit/interlaced files all throw, and
    * [[Multimodal.decodeOne]] degrades those rows to the stub. */
  def decodePng(bytes: Array[Byte]): Image = {
    require(isPng(bytes), "not a PNG")
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = be32(bytes, pos)
      require(len >= 0 && pos + 12 + len.toLong <= bytes.length, "truncated chunk")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, pos + 8 + len), s"bad CRC in $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          width = be32(bytes, pos + 8); height = be32(bytes, pos + 12)
          require(width > 0 && height > 0 && width.toLong * height <= 64L * 1024 * 1024,
            "absurd dimensions")
          require(bytes(pos + 16) == 8, "only 8-bit depth")
          colorType = bytes(pos + 17) & 0xFF
          require(colorType == 2 || colorType == 6, "only RGB/RGBA")
          require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0 && bytes(pos + 20) == 0,
            "unsupported compression/filter/interlace")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped (already CRC-checked)
      }
      pos += 12 + len
    }
    require(seenIhdr, "no IHDR")
    val bpp = if (colorType == 6) 4 else 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0) {
          require(!inf.needsInput() && !inf.needsDictionary(), "truncated IDAT")
        }
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException("bad deflate stream: " + e.getMessage)
    } finally inf.end()
    require(off == raw.length, "short raster")
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val in0 = y * (stride + 1) + 1
      val out0 = y * stride
      var x = 0
      ft match {
        case 0 =>
          System.arraycopy(raw, in0, out, out0, stride)
        case 1 => // Sub: left neighbor
          while (x < stride) {
            val a = if (x >= bpp) out(out0 + x - bpp) & 0xFF else 0
            out(out0 + x) = ((raw(in0 + x) & 0xFF) + a).toByte; x += 1
          }
        case 2 => // Up: north neighbor
          while (x < stride) {
            val b = if (y > 0) out(out0 - stride + x) & 0xFF else 0
            out(out0 + x) = ((raw(in0 + x) & 0xFF) + b).toByte; x += 1
          }
        case 3 => // Average: floor((left + up) / 2)
          while (x < stride) {
            val a = if (x >= bpp) out(out0 + x - bpp) & 0xFF else 0
            val b = if (y > 0) out(out0 - stride + x) & 0xFF else 0
            out(out0 + x) = ((raw(in0 + x) & 0xFF) + ((a + b) >> 1)).toByte; x += 1
          }
        case 4 => // Paeth predictor
          while (x < stride) {
            val a = if (x >= bpp) out(out0 + x - bpp) & 0xFF else 0
            val b = if (y > 0) out(out0 - stride + x) & 0xFF else 0
            val c = if (x >= bpp && y > 0) out(out0 - stride + x - bpp) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(out0 + x) = ((raw(in0 + x) & 0xFF) + pred).toByte; x += 1
          }
        case other => throw new IllegalArgumentException(s"bad filter type $other")
      }
      y += 1
    }
    if (bpp == 3) Image(width, height, out)
    else {
      val rgb = new Array[Byte](width * height * 3)
      var i = 0; var j = 0
      while (i < out.length) {
        rgb(j) = out(i); rgb(j + 1) = out(i + 1); rgb(j + 2) = out(i + 2)
        i += 4; j += 3
      }
      Image(width, height, rgb)
    }
  }

  /** Encode an [[Image]] as an 8-bit RGB PNG (filter 0 rows, one IDAT,
    * correct CRCs) — the fixture writer [[decodePng]] round-trips
    * byte-exactly against. */
  def encodePng(img: Image): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    PngSig.foreach(bos.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb); bos.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val v = crc.getValue.toInt
      bos.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val stride = img.width * 3
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(img.rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](8192)
    val comp = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  // ---- JPEG (via the JDK's bundled ImageIO reader) ----------------------

  /** SOI marker FF D8 followed by another marker byte — the JFIF/EXIF
    * container sniff. */
  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  /** Decode a JPEG through `javax.imageio` (the JDK ships a JPEG reader
    * — no external dependency) into the same 8-bit interleaved RGB
    * [[Image]] the PPM/PNG decoders produce, so resize/features/encode
    * compose identically. Undecodable or absurd payloads throw
    * IllegalArgumentException like the other strict decoders, which the
    * dispatch layer turns into the stub fallback. */
  def decodeJpeg(bytes: Array[Byte]): Image = {
    require(isJpeg(bytes), "not a JPEG")
    val bi =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(s"JPEG decode failed: ${e.getMessage}") }
    require(bi != null, "ImageIO found no reader for the payload")
    val w = bi.getWidth; val h = bi.getHeight
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
      s"absurd JPEG dimensions ${w}x$h")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = bi.getRGB(x, y)
        rgb(i) = ((p >> 16) & 0xFF).toByte
        rgb(i + 1) = ((p >> 8) & 0xFF).toByte
        rgb(i + 2) = (p & 0xFF).toByte
        i += 3; x += 1
      }
      y += 1
    }
    Image(w, h, rgb)
  }

  /** Encode through the JDK JPEG writer (fixture generation; lossy —
    * round-trips are approximate, unlike PPM/PNG). */
  def encodeJpeg(img: Image): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0; var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        bi.setRGB(x, y,
          ((img.rgb(i) & 0xFF) << 16) | ((img.rgb(i + 1) & 0xFF) << 8) |
            (img.rgb(i + 2) & 0xFF))
        i += 3; x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", out)
    out.toByteArray
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

  // ---- animated GIF (via the JDK's bundled ImageIO reader/writer) ----

  /** "GIF87a"/"GIF89a" container sniff. */
  def isGif(b: Array[Byte]): Boolean =
    b.length > 5 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  /** A decoded grayscale animation: per-frame w*h gray bytes, row-major.
    * The VIDEO-shaped modality with a real in-sandbox codec: GIF is
    * lossless for <=256 distinct levels, so an 8-bit gray animation
    * makes a byte-exact round trip (spec-pinned) — frame extraction,
    * scene-cut detection, and per-frame features all run over REAL
    * decoded frames. */
  case class GrayAnimation(width: Int, height: Int, frames: Seq[Array[Byte]])

  /** Encode a multi-frame grayscale animation as a REAL animated GIF
    * through `javax.imageio` (prepare/writeToSequence/end).
    *
    * Height floor: this JDK's GIF writer mis-encodes every row after
    * the first for images with height <= 4 (probed empirically — row 0
    * exact, rows 1.. garbled, at ANY width; heights >= 5 round-trip
    * byte-exactly). Refuse those instead of silently writing a lossy
    * file. */
  def encodeGifGray(anim: GrayAnimation): Array[Byte] = {
    import javax.imageio.ImageIO
    require(anim.height >= 5,
      s"encodeGifGray: height ${anim.height} <= 4 triggers a JDK GIF " +
        "writer defect (rows after the first garble); use height >= 5")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    anim.frames.foreach { f =>
      require(f.length == anim.width * anim.height, "frame size mismatch")
      val img = new java.awt.image.BufferedImage(anim.width, anim.height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < anim.height) {
        var x = 0
        while (x < anim.width) {
          img.getRaster.setSample(x, y, 0, f(y * anim.width + x) & 0xFF)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Decode every frame of a GIF to grayscale (the blue channel of the
    * palette-expanded pixel — exact for gray-palette GIFs, a luminance
    * proxy otherwise). */
  def decodeGifGray(bytes: Array[Byte]): GrayAnimation = {
    import javax.imageio.ImageIO
    require(isGif(bytes), "not a GIF container")
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, "no GIF reader in this JDK")
    val reader = readers.next()
    reader.setInput(iis)
    try {
      val n = reader.getNumImages(true)
      require(n > 0, "GIF with no frames")
      val first = reader.read(0)
      val (w, h) = (first.getWidth, first.getHeight)
      val frames = (0 until n).map { i =>
        val img = if (i == 0) first else reader.read(i)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = (img.getRGB(x, y) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        out
      }
      GrayAnimation(w, h, frames)
    } finally { reader.dispose(); iis.close() }
  }
}
