package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: an opaque binary payload plus routing metadata.
  * Image/audio/video bytes travel Spark as `binary` columns; nothing
  * in the engine interprets them except the decode boundary below. */
case class MediaFile(mediaId: Long, kind: String, payload: Array[Byte])

/** Typed metadata extracted at the decode boundary. */
case class MediaMeta(
    mediaId: Long, kind: String, nBytes: Long, sha256: String,
    width: Int, height: Int, durationMs: Long)

/** Fixed-width feature vector per media object. */
case class MediaFeature(mediaId: Long, kind: String, feature: Array[Float])

/** Multimodal column handling (SURVEY §2.3): binary payloads with
  * typed metadata, decode / feature-extract / frame-sample stages as
  * partition-batched transforms over `Dataset[MediaFile]`.
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not
  * available in this environment, so `decodeStub` derives
  * deterministic fake dimensions/duration/features from the payload's
  * SHA-256. Everything around the stub — the binary column schema,
  * the `mapPartitions` batch shape (one codec init per partition, not
  * per row), the typed Dataset boundaries, and the partitioning
  * behavior — is real, which is the part that matters for the Spark
  * plumbing at 100 TB: payloads never pass through a shuffle unless
  * the caller asks for one, and the decode cost is linear per
  * partition with no driver involvement.
  */
object MediaOps {

  private def sha256Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  /** STUB — stands in for a real codec (libjpeg/ffmpeg/...): derives
    * deterministic pseudo-metadata from the payload hash. Replace the
    * body with a real decoder; the signature and batch usage stay. */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    def u16(i: Int): Int = ((h(i) & 0xff) << 8) | (h(i + 1) & 0xff)
    (u16(0) % 1920 + 1, u16(2) % 1080 + 1, (u16(4).toLong * 100) + 1)
  }

  /** STUB feature extractor: hash-chained floats in [-1, 1); real
    * implementation would run the payload through a vision/audio
    * encoder per partition-batch. */
  private[multimodal] def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val out = new Array[Float](dim)
    var h = md.digest(payload)
    var i = 0
    while (i < dim) {
      if (i % 32 == 0 && i > 0) h = md.digest(h)
      out(i) = ((h(i % 32) & 0xff) - 128) / 128.0f
      i += 1
    }
    out
  }

  /** Wrap a text table as fake media files (payload = utf-8 bytes) —
    * the fixture generator for specs and the declared query. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("mediaId"),
        lit("image").as("kind"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaFile]
  }

  /** Decode boundary: one `mapPartitions` pass — codec state (here the
    * MessageDigest) IS initialized once per partition and the payload
    * is hashed exactly once per row, with both the content hex and the
    * fake decode derived from that single digest — the amortization
    * shape a real decoder (model weights, codec contexts) would keep. */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { f =>
        val h = md.digest(f.payload) // digest() resets md for reuse
        def u16(i: Int): Int = ((h(i) & 0xff) << 8) | (h(i + 1) & 0xff)
        MediaMeta(f.mediaId, f.kind, f.payload.length.toLong,
          h.map(b => f"$b%02x").mkString,
          u16(0) % 1920 + 1, u16(2) % 1080 + 1, (u16(4).toLong * 100) + 1)
      }
    }
  }

  /** Feature extraction with an explicit batch shape. */
  def extractFeatures(files: Dataset[MediaFile], dim: Int): Dataset[MediaFeature] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map(f => MediaFeature(f.mediaId, f.kind, featureStub(f.payload, dim)))
    }
  }

  /** Frame sampling shape for video-kind payloads: emits one row per
    * sampled frame (STUB: slices the payload deterministically). */
  def sampleFrames(files: Dataset[MediaFile], everyBytes: Int): DataFrame = {
    import files.sparkSession.implicits._
    files.flatMap { f =>
      f.payload.grouped(everyBytes).zipWithIndex.map {
        case (chunk, idx) => (f.mediaId, idx, chunk)
      }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }
}
