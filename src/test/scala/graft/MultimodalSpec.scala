package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFile, MediaFeatures}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("partition-wise batched decode produces typed features") {
    import spark.implicits._
    val media = spark.createDataset((0 until 200).map { i =>
      MediaFile(i.toLong, Seq("image", "audio", "video")(i % 3),
        Array.fill[Byte](10 + i)((i % 127).toByte))
    }).repartition(4)
    val feats = Multimodal.extractFeatures(media, batchSize = 16).collect()
    assert(feats.length == 200)
    val img = feats.find(_.media_id == 0).get
    assert(img.kind == "image" && img.width == 64 + 10 % 512 && img.n_frames == 1)
    // features are an L1-normalized 8-bin histogram
    feats.foreach { f =>
      assert(f.feature.length == 8)
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3)
    }
    // determinism: same input -> same features
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.feature.toSeq))
  }

  test("resize fits images inside the bound, preserves aspect, skips others") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaFile(1, "image", Array.fill[Byte](300)(1)),  // 364 x 106 -> resized
      MediaFile(2, "image", Array.fill[Byte](10)(1)),   // 74 x 65 -> untouched
      MediaFile(3, "video", Array.fill[Byte](500)(1)))) // non-image -> untouched
    val out = Multimodal.resize(media, maxDim = 128).collect()
      .map(f => f.media_id -> f).toMap
    val (w1, h1, _) = Multimodal.FakeCodec.decode("image", Array.fill[Byte](300)(1))
    assert(out(1).width == 128)
    assert(out(1).height == math.round(h1 * 128.0 / w1).toInt)
    assert(math.max(out(1).width, out(1).height) <= 128)
    val (w2, h2, _) = Multimodal.FakeCodec.decode("image", Array.fill[Byte](10)(1))
    assert(out(2).width == w2 && out(2).height == h2)
    val (w3, h3, _) = Multimodal.FakeCodec.decode("video", Array.fill[Byte](500)(1))
    assert(out(3).width == w3 && out(3).height == h3)
  }

  test("synthetic media from documents + frame sampling") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.extractFeatures(media)
    val n = feats.count()
    assert(n == 500)
    val frames = Multimodal.sampleFrames(feats, stride = 10)
    val row = frames.limit(1).collect()(0)
    val idx = row.getSeq[Int](2)
    assert(idx.nonEmpty && idx.head == 0)
  }

  // ---- REAL codecs (RealCodec): byte-exact fixtures -----------------------

  import graft.multimodal.RealCodec

  test("PPM P6: hand-built fixture with header comments decodes byte-exactly") {
    // 2x2 image: red, green / blue, white — with a comment in the header
    val raster = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val bytes = ("P6\n# fixture comment\n2 2\n255\n".getBytes("US-ASCII") ++ raster)
    val img = RealCodec.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == raster.toSeq)
    // canonical re-encode re-decodes to the same image
    val again = RealCodec.decodePpm(RealCodec.encodePpm(img))
    assert(again.width == 2 && again.height == 2 && again.rgb.toSeq == raster.toSeq)
  }

  test("PPM nearest-neighbor resize picks exact source pixels") {
    // 4x2 with distinct per-pixel values; resize to maxDim 2 -> 2x1
    val raster = (0 until 4 * 2 * 3).map(_.toByte).toArray
    val img = RealCodec.Image(4, 2, raster)
    val out = RealCodec.resizeNearest(img, 2)
    assert(out.width == 2 && out.height == 1)
    // target (x,0) samples source (x*4/2, 0*2/1) = (2x, 0)
    def px(i: RealCodec.Image, x: Int, y: Int): Seq[Byte] =
      Seq.tabulate(3)(c => i.rgb((y * i.width + x) * 3 + c))
    assert(px(out, 0, 0) == px(img, 0, 0))
    assert(px(out, 1, 0) == px(img, 2, 0))
    // identity when within bounds
    assert(RealCodec.resizeNearest(img, 4) eq img)
  }

  test("WAV PCM-16: hand-built and encoder round-trips decode exactly") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val wav = RealCodec.Wav(channels = 2, sampleRate = 44100, samples = samples)
    val decoded = RealCodec.decodeWav(RealCodec.encodeWav(wav))
    assert(decoded.channels == 2 && decoded.sampleRate == 44100)
    assert(decoded.samples.toSeq == samples.toSeq)
    // an unknown chunk BEFORE fmt/data must be skipped (padding rule too)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val canonical = RealCodec.encodeWav(wav)
    val withJunk = canonical.take(12) ++ junk ++ canonical.drop(12)
    // fix RIFF size field (not validated by our reader, but keep it honest)
    val re = RealCodec.decodeWav(withJunk)
    assert(re.samples.toSeq == samples.toSeq && re.channels == 2)
  }

  test("extractFeatures content-sniffs: real PPM/WAV dims, stub for the rest") {
    import spark.implicits._
    val ppm = RealCodec.encodePpm(RealCodec.Image(3, 5,
      Array.fill[Byte](3 * 5 * 3)(100.toByte)))
    val wav = RealCodec.encodeWav(RealCodec.Wav(1, 16000, Array[Short](5, -5, 5, -5)))
    val other = Array.fill[Byte](42)(9)
    val media = spark.createDataset(Seq(
      MediaFile(1, "image", ppm), MediaFile(2, "audio", wav),
      MediaFile(3, "image", other)))
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out(1).width == 3 && out(1).height == 5 && out(1).n_frames == 1)
    assert(out(1).feature(0) == 100f / 255f) // real channel mean
    assert(out(2).width == 1 && out(2).n_frames == 4) // channels, samples/ch
    assert(out(2).feature(1) == 5f / 32768f) // real max |amp|
    val (fw, fh, _) = Multimodal.FakeCodec.decode("image", other)
    assert(out(3).width == fw && out(3).height == fh) // stub fallback intact
  }

  test("corrupt/adversarial payloads degrade to the stub, never crash the decode") {
    import spark.implicits._
    // truncated raster, wrap-attack headers (Int-overflow laundering),
    // zero dimension, non-PCM WAV: every one sniffs as real, every one
    // must fall back to FakeCodec at the ROW level (one bad file in a
    // media column cannot fail the job)
    val truncated = "P6\n10 10\n255\n".getBytes("ISO-8859-1") ++ Array.fill[Byte](5)(1)
    val wrap32 = "P6\n4294967297 4294967297\n255\n".getBytes("ISO-8859-1") ++
      Array.fill[Byte](9)(1)
    val wrapNeg = "P6\n50000 28634\n255\n".getBytes("ISO-8859-1") ++
      Array.fill[Byte](8)(1)
    val zeroDim = "P6\n0 5\n255\n".getBytes("ISO-8859-1")
    val media = spark.createDataset(Seq(
      MediaFile(1, "image", truncated), MediaFile(2, "image", wrap32),
      MediaFile(3, "image", wrapNeg), MediaFile(4, "image", zeroDim)))
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out.size == 4, "all corrupt rows must survive")
    out.values.foreach { f =>
      val (fw, fh, _) = Multimodal.FakeCodec.decode("image", Array[Byte]())
      assert(f.width > 0 || f.width == fw, s"media ${f.media_id} leaked garbage dims")
      assert(f.width <= 4096 && f.height <= 4096,
        s"media ${f.media_id}: wrap-attack dimensions escaped: ${f.width}x${f.height}")
    }
    // resize path takes the same fallback
    val resized = Multimodal.resize(media, 2).collect()
    assert(resized.length == 4)
  }

  test("resize actually resamples a PPM payload (features from resized pixels)") {
    import spark.implicits._
    // 4x4 PPM, all-white except one black pixel at (0,0)
    val raster = Array.fill[Byte](4 * 4 * 3)(255.toByte)
    raster(0) = 0; raster(1) = 0; raster(2) = 0
    val ppm = RealCodec.encodePpm(RealCodec.Image(4, 4, raster))
    val out = Multimodal.resize(spark.createDataset(Seq(MediaFile(1, "image", ppm))),
      maxDim = 2).collect().head
    assert(out.width == 2 && out.height == 2)
    // nearest-neighbor keeps the black pixel at (0,0): mean < 1.0
    assert(out.feature(0) == (0f + 255f * 3) / 4 / 255f)
  }

  // ---- PNG ---------------------------------------------------------------

  /** Hand-assemble a PNG from raw (already-filtered) scanlines — the
    * encoder only emits filter 0, so the five defilter paths need a
    * fixture built from first principles. */
  private def pngFromRaw(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).foreach(bos.write)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      bos.write(Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb); bos.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      val v = crc.getValue.toInt
      bos.write(Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
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

  test("animated GIF: multi-frame gray roundtrip is byte-exact; corrupt payloads refuse") {
    import graft.multimodal.RealCodec
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 5) {
      // height floor 5: the JDK GIF writer garbles rows after the first
      // below it (probed; encodeGifGray refuses those)
      val (w, h, n) = (3 + rnd.nextInt(20), 5 + rnd.nextInt(12), 1 + rnd.nextInt(8))
      val frames = (0 until n).map { _ =>
        val a = new Array[Byte](w * h); rnd.nextBytes(a); a
      }
      val gif = RealCodec.encodeGifGray(RealCodec.GrayAnimation(w, h, frames))
      assert(RealCodec.isGif(gif), s"trial $trial: bad magic")
      val dec = RealCodec.decodeGifGray(gif)
      assert(dec.width == w && dec.height == h && dec.frames.length == n)
      frames.zip(dec.frames).zipWithIndex.foreach { case ((e, g), i) =>
        assert(java.util.Arrays.equals(e, g),
          s"trial $trial frame $i: lossy roundtrip") }
      // truncated/garbled payloads throw cleanly instead of hanging
      intercept[Exception] {
        RealCodec.decodeGifGray(gif.take(10))
      }
      val garbled = gif.clone(); garbled(gif.length / 2) =
        (garbled(gif.length / 2) ^ 0x5A).toByte
      try { RealCodec.decodeGifGray(garbled); () }
      catch { case _: Exception => () } // either refuse or decode; never hang
    }
    intercept[IllegalArgumentException] {
      RealCodec.decodeGifGray(Array[Byte](1, 2, 3))
    }
    // the documented JDK-writer-defect envelope is enforced
    intercept[IllegalArgumentException] {
      RealCodec.encodeGifGray(RealCodec.GrayAnimation(9, 4,
        Seq(new Array[Byte](36))))
    }
    // content-sniffed dispatch: a GIF payload yields REAL dims + frame
    // count through the generic feature extractor
    import spark.implicits._
    val g = RealCodec.encodeGifGray(RealCodec.GrayAnimation(7, 6,
      (0 until 3).map(f => Array.tabulate[Byte](42)(i => ((f * 40 + i) % 251).toByte))))
    val out = Multimodal.extractFeatures(
      spark.createDataset(Seq(MediaFile(99L, "video", g)))).collect()
    assert(out.length == 1)
    assert(out(0).width == 7 && out(0).height == 6 && out(0).n_frames == 3,
      s"GIF dispatch broke: ${out(0).width}x${out(0).height}x${out(0).n_frames}")
  }

  test("PNG: encoder round-trips byte-exactly; RGBA drops alpha") {
    val rnd = new scala.util.Random(7)
    val rgb = Array.fill[Byte](5 * 3 * 3)(rnd.nextInt(256).toByte)
    val png = RealCodec.encodePng(RealCodec.Image(5, 3, rgb))
    assert(RealCodec.isPng(png) && !RealCodec.isPpm(png) && !RealCodec.isWav(png))
    val back = RealCodec.decodePng(png)
    assert(back.width == 5 && back.height == 3)
    assert(back.rgb.toSeq == rgb.toSeq)
    // RGBA (color type 6): alpha byte stripped, colors byte-exact
    val w = 3; val h = 2
    val rgba = Array.tabulate[Byte](w * h * 4)(i => (i * 7 + 3).toByte)
    val raw = new Array[Byte]((w * 4 + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w * 4 + 1)) = 0
      System.arraycopy(rgba, y * w * 4, raw, y * (w * 4 + 1) + 1, w * 4)
    }
    val img = RealCodec.decodePng(pngFromRaw(w, h, 6, raw))
    val expect = (0 until w * h).flatMap(p => (0 until 3).map(c => rgba(p * 4 + c)))
    assert(img.rgb.toSeq == expect)
  }

  test("PNG: all five scanline filters defilter to the exact raster") {
    // known raster, 4x5 RGB; filter each row FORWARD with type = row % 5,
    // per the spec's filter equations — the decoder must invert them all
    val w = 4; val h = 5; val bpp = 3; val stride = w * bpp
    val rnd = new scala.util.Random(13)
    val raster = Array.fill[Byte](stride * h)(rnd.nextInt(256).toByte)
    def px(y: Int, x: Int): Int =
      if (x < 0) 0 else if (y < 0) 0 else raster(y * stride + x) & 0xFF
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = px(y, x); val a = px(y, x - bpp); val b = px(y - 1, x)
        val c = if (x >= bpp && y > 0) px(y - 1, x - bpp) else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            cur - pred
        }
        raw(y * (stride + 1) + 1 + x) = filtered.toByte
      }
    }
    val img = RealCodec.decodePng(pngFromRaw(w, h, 2, raw))
    assert(img.width == w && img.height == h)
    assert(img.rgb.toSeq == raster.toSeq)
  }

  test("PNG: corrupt/adversarial payloads degrade to the stub") {
    import spark.implicits._
    val good = RealCodec.encodePng(RealCodec.Image(4, 4, Array.fill[Byte](48)(9)))
    // bit-flip inside IDAT (CRC catches it), truncation series, absurd
    // dims, bad filter type, 16-bit depth
    val flipped = good.clone(); flipped(good.length - 20) = (flipped(good.length - 20) ^ 0x40).toByte
    val truncated = good.take(good.length - 9)
    val headerOnly = good.take(20)
    val absurd = {
      val raw = Array[Byte](0, 1, 1, 1) // 1 row
      pngFromRaw(1, 1, 2, raw).patch(16, Array[Byte](127, -1, -1, -1), 4) // huge width, stale CRC
    }
    val badFilter = {
      val raw = Array[Byte](9, 1, 1, 1) // filter type 9
      pngFromRaw(1, 1, 2, raw)
    }
    val media = spark.createDataset(Seq(
      MediaFile(1, "image", flipped), MediaFile(2, "image", truncated),
      MediaFile(3, "image", headerOnly), MediaFile(4, "image", absurd),
      MediaFile(5, "image", badFilter), MediaFile(6, "image", good)))
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out.size == 6, "all rows must survive")
    // the good row decodes for real (4x4); corrupt rows take stub dims
    assert(out(6L).width == 4 && out(6L).height == 4)
    (1L to 5L).foreach { id =>
      assert(out(id).width <= 4096 && out(id).height <= 4096,
        s"media $id leaked adversarial dims: ${out(id).width}x${out(id).height}")
    }
    // resize path: PNG now resamples like PPM
    val resized = Multimodal.resize(spark.createDataset(Seq(MediaFile(7, "image", good))),
      maxDim = 2).collect().head
    assert(resized.width == 2 && resized.height == 2)
  }

  // ---- JPEG (JDK ImageIO) -------------------------------------------------

  test("JPEG: ImageIO round-trip decodes real dims and near-exact pixels") {
    // a smooth gradient survives JPEG quantization within a small bound
    val w = 16; val h = 12
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (x * 8).toByte; rgb(i + 1) = (y * 8).toByte; rgb(i + 2) = 64.toByte
    }
    val img = RealCodec.Image(w, h, rgb)
    val jpeg = RealCodec.encodeJpeg(img)
    assert(RealCodec.isJpeg(jpeg), "encoder must emit the FF D8 FF magic")
    assert(!RealCodec.isPng(jpeg) && !RealCodec.isPpm(jpeg) && !RealCodec.isWav(jpeg))
    val back = RealCodec.decodeJpeg(jpeg)
    assert(back.width == w && back.height == h)
    val maxErr = back.rgb.indices.map(i =>
      math.abs((back.rgb(i) & 0xFF) - (rgb(i) & 0xFF))).max
    assert(maxErr <= 32, s"JPEG round-trip drifted by $maxErr levels")
  }

  test("JPEG: dispatch decodes real payloads, corrupt ones degrade to the stub") {
    import spark.implicits._
    val good = RealCodec.encodeJpeg(RealCodec.Image(6, 4, Array.fill[Byte](72)(50)))
    val truncated = good.take(8) // SOI + APP0 start, then nothing
    val garbage = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++
      Array.fill[Byte](64)(0x5A)
    val media = spark.createDataset(Seq(
      MediaFile(1, "image", good), MediaFile(2, "image", truncated),
      MediaFile(3, "image", garbage)))
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(out.size == 3, "all rows must survive")
    assert(out(1L).width == 6 && out(1L).height == 4,
      s"real JPEG went to the stub: ${out(1L).width}x${out(1L).height}")
    // corrupt rows fall back to the stub's content-derived dims
    Seq(2L, 3L).foreach { id =>
      assert(out(id).width <= 4096 && out(id).height <= 4096,
        s"media $id leaked adversarial dims")
    }
  }
}
