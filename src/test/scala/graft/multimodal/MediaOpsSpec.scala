package graft.multimodal

import graft.SparkTestBase

class MediaOpsSpec extends SparkTestBase {

  private def files(n: Int) = {
    import spark.implicits._
    (0 until n).map(i =>
      MediaFile(i.toLong, if (i % 2 == 0) "image" else "video",
        s"payload-$i-${"x" * i}".getBytes("UTF-8")))
      .toDS().repartition(3)
  }

  test("metadata extraction is deterministic; unrecognized payloads report zeros") {
    val metas = MediaOps.extractMeta(files(20)).collect().sortBy(_.mediaId)
    val again = MediaOps.extractMeta(files(20)).collect().sortBy(_.mediaId)
    assert(metas.toSeq == again.toSeq, "decode must be deterministic")
    metas.foreach { m =>
      // no parser recognizes these payloads: zeros, never synthesized
      assert(m.width == 0 && m.height == 0 && m.durationMs == 0L)
      assert(m.sha256.length == 64)
      assert(m.nBytes == s"payload-${m.mediaId}-${"x" * m.mediaId.toInt}".length)
    }
  }

  test("WAV and MP4 durations parse from the header bytes alone") {
    import spark.implicits._
    val body = new Array[Byte](44100 * 2 * 3 + 441) // 3.01 s of 16-bit mono
    val ds = Seq(
      MediaFile(0L, "audio/wav", MediaCodec.wavBytes(44100, 1, 16, body)),
      MediaFile(1L, "audio/wav", MediaCodec.wavBytes(8000, 2, 16, new Array[Byte](8000 * 4))),
      MediaFile(2L, "video/mp4", MediaCodec.mp4Bytes(600, 1501, "x".getBytes)),
      MediaFile(3L, "video/mp4", MediaCodec.mp4Bytes(90000, 123456789L, "x".getBytes, version = 1))
    ).toDS()
    val metas = MediaOps.extractMeta(ds).collect().sortBy(_.mediaId)
    assert(metas(0).durationMs == (44100 * 2 * 3 + 441) * 1000L / (44100 * 2))
    assert(metas(1).durationMs == 1000L) // 32000 bytes / 32000 B/s
    assert(metas(2).durationMs == 1501L * 1000 / 600)
    assert(metas(3).durationMs == 123456789L * 1000 / 90000)
    metas.foreach(m => assert(m.width == 0 && m.height == 0))
  }

  test("WAV/MP4 content features exclude the container header bytes") {
    import spark.implicits._
    val body = "abc 123 abc".getBytes("UTF-8")
    val ds = Seq(
      MediaFile(0L, "image/png", MediaCodec.pngBytes(960, 540, body)),
      MediaFile(1L, "audio/wav", MediaCodec.wavBytes(16000, 1, 16, body)),
      MediaFile(2L, "video/mp4", MediaCodec.mp4Bytes(600, 600, body))).toDS()
    val feats = MediaOps.extractFeatures(ds).collect().sortBy(_.mediaId)
    // identical content stream => identical byte-stat components
    assert(feats(1).feature.drop(2).toSeq == feats(0).feature.drop(2).toSeq)
    assert(feats(2).feature.drop(2).toSeq == feats(0).feature.drop(2).toSeq)
    // time-based containers carry no dimensions
    assert(feats(1).feature(0) == 0f && feats(2).feature(0) == 0f)
  }

  test("truncated or malformed WAV/MP4 headers yield zeros, not crashes") {
    import spark.implicits._
    val wav = MediaCodec.wavBytes(8000, 1, 16, "hello".getBytes)
    val mp4 = MediaCodec.mp4Bytes(600, 600, "hello".getBytes)
    val ds = Seq(
      MediaFile(0L, "audio/wav", wav.take(30)),          // truncated mid-fmt
      MediaFile(1L, "video/mp4", mp4.take(25)),          // truncated mid-moov
      MediaFile(2L, "audio/wav", {                       // data chunk renamed away
        val b = wav.clone(); b(36) = 'x'.toByte; b
      }),
      MediaFile(3L, "video/mp4", {                       // crafted huge box size
        val b = mp4.clone(); b(20) = 0x7f.toByte; b
      })).toDS()
    val metas = MediaOps.extractMeta(ds).collect()
    metas.foreach(m => assert(m.durationMs == 0L, s"media ${m.mediaId}"))
  }

  test("feature vectors are deterministic content statistics in [0, 1]") {
    val feats = MediaOps.extractFeatures(files(10)).collect().sortBy(_.mediaId)
    val again = MediaOps.extractFeatures(files(10)).collect().sortBy(_.mediaId)
    assert(feats.length == 10)
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq,
      "content features must be deterministic")
    feats.foreach { f =>
      assert(f.feature.length == MediaOps.FeatureDim)
      assert(f.feature.forall(x => x >= 0.0f && x <= 1.0f))
      // non-image payloads carry no parsed dimensions
      assert(f.feature(0) == 0.0f && f.feature(1) == 0.0f)
    }
  }

  test("image features recover header dims and exclude header bytes") {
    import spark.implicits._
    val body = "abc 123 abc".getBytes("UTF-8")
    val ds = Seq(
      MediaFile(0L, "image/png", MediaCodec.pngBytes(960, 540, body)),
      MediaFile(1L, "image/jpeg", MediaCodec.jpegBytes(192, 108, body))).toDS()
    val feats = MediaOps.extractFeatures(ds).collect().sortBy(_.mediaId)
    assert(feats(0).feature(0) == (960 / 1920.0).toFloat)
    assert(feats(0).feature(1) == (540 / 1080.0).toFloat)
    assert(feats(1).feature(0) == (192 / 1920.0).toFloat)
    assert(feats(1).feature(1) == (108 / 1080.0).toFloat)
    // byte stats over the CONTENT stream only: identical body =>
    // identical content components despite different headers
    assert(feats(0).feature.drop(2).toSeq == feats(1).feature.drop(2).toSeq)
    // whitespace fraction of "abc 123 abc": 2 spaces / 11 bytes
    assert(feats(0).feature(4) == (2.0 / 11).toFloat)
    assert(feats(0).feature(6) == (3.0 / 11).toFloat) // digits
  }

  test("frame sampling REALLY decodes every sampled tick (exact luma)") {
    import spark.implicits._
    // 3 videos, 4 frames each: frame j pixel p = (10*id + p + j) % 256
    def lum(id: Long, j: Int, w: Int, h: Int): Array[Int] =
      Array.tabulate(w * h)(p => ((10 * id + p + j) % 256).toInt)
    val vids = (0L until 3L).map { id =>
      val frames = (0 until 4).map(j =>
        MediaCodec.pngEncodeGray(6, 5, lum(id, j, 6, 5)))
      MediaFile(id, "video/mp4", MediaCodec.videoBytes(600, 2400L, frames))
    }
    val got = MediaOps.sampleFrames(vids.toDS(), every = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).sortBy(t => (t._1, t._2))
    // frames 0 and 2 sampled, each genuinely decoded
    val expect = for (id <- 0L until 3L; j <- Seq(0, 2)) yield
      (id, j, 6, 5, lum(id, j, 6, 5).map(_.toLong).sum)
    assert(got.toSeq == expect.toSeq, got.mkString(", "))
    // a NON-tick-stream mp4 (text body) emits no frames
    val plain = Seq(MediaFile(9L, "video/mp4",
      MediaCodec.mp4Bytes(600, 100L, "not a frame stream".getBytes)))
    assert(MediaOps.sampleFrames(plain.toDS(), every = 1).count() == 0L)
  }

  test("byte-different, pixel-identical frame encodings sample identically") {
    import spark.implicits._
    val w = 7; val h = 4
    val lum = Array.tabulate(w * h)(p => (p * 11) % 256)
    // gray PNG vs truecolor PNG with r=g=b: different bytes, same luma
    val gray = MediaCodec.pngEncodeGray(w, h, lum)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = lum(y * w + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rgb = bos.toByteArray
    assert(!java.util.Arrays.equals(gray, rgb), "encodings should differ")
    val vids = Seq(
      MediaFile(1L, "video/mp4", MediaCodec.videoBytes(600, 600L, Seq(gray))),
      MediaFile(2L, "video/mp4", MediaCodec.videoBytes(600, 600L, Seq(rgb))))
    val rows = MediaOps.sampleFrames(vids.toDS(), every = 1).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0)._2 == rows(1)._2 && rows(0)._3 == rows(1)._3 &&
      rows(0)._4 == rows(1)._4,
      s"pixel-identical re-encodes must hash equal: ${rows.toSeq}")
  }

  test("decode runs partition-parallel with no shuffle of payloads") {
    val plan = MediaOps.extractMeta(files(8)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decode pass must not shuffle payloads:\n$plan")
  }

  test("file-lake staging + binaryFile source round-trips every byte") {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File("target/graft_test/media_files")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    if (dir.exists()) deleteRec(dir)
    val ds = files(12)
    MediaOps.writeMediaFiles(ds, dir.getAbsolutePath)
    // one object per payload, named by id (plus the commit marker)
    val names = dir.listFiles().map(_.getName).filter(_.endsWith(".bin"))
      .sorted
    assert(names.toSeq == (0 until 12).map(i => s"$i.bin").sorted)
    assert(new java.io.File(dir, "_SUCCESS").exists(),
      "staging must land a commit marker for freshness checks")
    val back = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.getAbsolutePath)
      .select(regexp_extract(col("path"), "([0-9]+)\\.bin$", 1)
        .cast("long").as("id"), col("content"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val original = ds.collect().map(f => f.mediaId -> f.payload.toSeq).toMap
    assert(back == original, "binaryFile read must preserve every byte")
  }
}
