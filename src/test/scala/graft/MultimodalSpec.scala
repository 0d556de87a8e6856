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
}
