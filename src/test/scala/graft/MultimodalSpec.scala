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
}
