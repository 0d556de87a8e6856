package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs partition-wise
  * in bounded batches (the Scala analogue of `mapInPandas` batch processing).
  *
  * Decode is content-sniffed per payload: the zero-dependency formats are
  * decoded FOR REAL ([[RealCodec]] — P6 PPM images byte-exactly, 16-bit PCM
  * WAV audio chunk-by-chunk); containers needing native libraries absent
  * from this environment (JPEG, MP4, ...) fall back to the deterministic
  * [[FakeCodec]] stub at the same signature. Either way the Spark side is
  * identical and tested: the schema, the binary column plumbing, the
  * partition-wise batch shape, and the feature vector output contract.
  *
  * Scale: decode is the hot loop — it runs inside `mapPartitions` with NO
  * shuffle (narrow dependency on the scan); batches bound peak memory to
  * `batchSize * maxMediaBytes`; downstream joins see only the small decoded
  * features, never the raw bytes (project-away early).
  */
object Multimodal {

  case class MediaFile(media_id: Long, kind: String, content: Array[Byte])
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Deterministic stand-in for an image/audio/video decoder. Derives
    * "dimensions" and a feature vector from the bytes themselves so tests
    * are reproducible. Replace with a real codec at the same signature. */
  object FakeCodec {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      kind match {
        case "image" => (64 + n % 512, 64 + (n / 7) % 512, 1)
        case "video" => (320, 240, 1 + n % 240)
        case "audio" => (1, 0, n / 4) // channels, -, samples
        case _       => (0, 0, 0)
      }
    }

    /** 8-dim byte-histogram feature, L1-normalized — deterministic fake of
      * an embedding model's output. */
    def features(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
      val hist = new Array[Float](dims)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) % dims) += 1f; i += 1 }
      val total = math.max(bytes.length, 1).toFloat
      hist.map(_ / total)
    }
  }

  /** Content-sniffed single-payload decode: real codec when the bytes
    * are a format we can decode with the JDK alone, stub otherwise. A
    * payload that passes the magic-byte sniff but fails the strict
    * decoder (truncated raster, non-PCM WAV, absurd dimensions) falls
    * back to the stub too — ONE corrupt file in a 100 TB media column
    * must degrade that row's features, not kill the whole job. */
  private[multimodal] def decodeOne(m: MediaFile): MediaFeatures = {
    val real: Option[MediaFeatures] =
      try {
        if (RealCodec.isPpm(m.content)) {
          val img = RealCodec.decodePpm(m.content)
          Some(MediaFeatures(m.media_id, m.kind, img.width, img.height, 1,
            RealCodec.imageFeatures(img)))
        } else if (RealCodec.isPng(m.content)) {
          val img = RealCodec.decodePng(m.content)
          Some(MediaFeatures(m.media_id, m.kind, img.width, img.height, 1,
            RealCodec.imageFeatures(img)))
        } else if (RealCodec.isJpeg(m.content)) {
          val img = RealCodec.decodeJpeg(m.content)
          Some(MediaFeatures(m.media_id, m.kind, img.width, img.height, 1,
            RealCodec.imageFeatures(img)))
        } else if (RealCodec.isWav(m.content)) {
          val w = RealCodec.decodeWav(m.content)
          Some(MediaFeatures(m.media_id, m.kind, w.channels, 0,
            w.samples.length / math.max(w.channels, 1), RealCodec.audioFeatures(w)))
        } else if (RealCodec.isGif(m.content)) {
          // animated GIF = the real video-shaped path: real frame count,
          // features from the FIRST decoded frame (gray replicated to RGB)
          val anim = RealCodec.decodeGifGray(m.content)
          val rgb = new Array[Byte](anim.width * anim.height * 3)
          var i = 0
          while (i < anim.width * anim.height) {
            val v = anim.frames.head(i)
            rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
            i += 1
          }
          Some(MediaFeatures(m.media_id, m.kind, anim.width, anim.height,
            anim.frames.length,
            RealCodec.imageFeatures(RealCodec.Image(anim.width, anim.height, rgb))))
        } else None
      } catch { case _: IllegalArgumentException => None }
    real.getOrElse {
      val (w, h, frames) = FakeCodec.decode(m.kind, m.content)
      MediaFeatures(m.media_id, m.kind, w, h, frames, FakeCodec.features(m.content))
    }
  }

  /** Partition-wise batched decode: groups each partition's rows into
    * `batchSize` batches (modeling a vectorized decoder call), maps each
    * batch through the codec, and emits typed features. */
  def extractFeatures(media: Dataset[MediaFile], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "vectorized" codec invocation per batch
        batch.map(decodeOne)
      }
    }
  }

  /** Synthesize a media table from the documents corpus (deterministic):
    * text bytes as payload, kind cycling image/audio/video. Lets the
    * multimodal path run against the driver's parquet corpus. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaFile]
  }

  /** Frame sampling for video-kind media: every `stride`-th frame index up
    * to n_frames — the plumbing for frame-level feature extraction. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_idx"))

  /** Resize image-kind media to fit inside `maxDim` x `maxDim`, preserving
    * aspect ratio (no-op for media already within bounds, and for non-image
    * kinds). Same partition-wise no-shuffle shape as [[extractFeatures]].
    * A PPM payload is ACTUALLY resampled ([[RealCodec.resizeNearest]],
    * pure integer nearest-neighbor) and its features come from the resized
    * pixels; other payloads keep the stubbed dimension arithmetic. */
  def resize(media: Dataset[MediaFile], maxDim: Int, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          // DELIBERATE asymmetry with decodeOne: decode sniffs content
          // regardless of declared kind (features of mislabeled media
          // are still real), but RESIZING is an image-kind operation —
          // this scaladoc's "no-op for non-image kinds" contract keeps
          // a PPM payload tagged audio/video untouched here. Decode
          // failures degrade to the stub like decodeOne.
          val realImg =
            if (m.kind == "image" && (RealCodec.isPpm(m.content) || RealCodec.isPng(m.content)))
              try {
                val decoded = if (RealCodec.isPpm(m.content)) RealCodec.decodePpm(m.content)
                  else RealCodec.decodePng(m.content)
                Some(RealCodec.resizeNearest(decoded, maxDim))
              } catch { case _: IllegalArgumentException => None }
            else None
          realImg match {
            case Some(img) =>
              MediaFeatures(m.media_id, m.kind, img.width, img.height, 1,
                RealCodec.imageFeatures(img))
            case None =>
              val (w, h, frames) = FakeCodec.decode(m.kind, m.content)
              val (rw, rh) =
                if (m.kind != "image" || math.max(w, h) <= maxDim) (w, h)
                else {
                  val scale = maxDim.toDouble / math.max(w, h)
                  (math.max(1, math.round(w * scale).toInt),
                    math.max(1, math.round(h * scale).toInt))
                }
              MediaFeatures(m.media_id, m.kind, rw, rh, frames,
                FakeCodec.features(m.content))
          }
        }
      }
    }
  }
}
