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

  test("metadata extraction is deterministic and bounded") {
    val metas = MediaOps.extractMeta(files(20)).collect().sortBy(_.mediaId)
    val again = MediaOps.extractMeta(files(20)).collect().sortBy(_.mediaId)
    assert(metas.toSeq == again.toSeq, "decode stub must be deterministic")
    metas.foreach { m =>
      assert(m.width >= 1 && m.width <= 1920)
      assert(m.height >= 1 && m.height <= 1080)
      assert(m.durationMs >= 1)
      assert(m.sha256.length == 64)
      assert(m.nBytes == s"payload-${m.mediaId}-${"x" * m.mediaId.toInt}".length)
    }
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

  test("frame sampling splits payloads and preserves all bytes in order") {
    val ds = files(4)
    val frames = MediaOps.sampleFrames(ds, everyBytes = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val reassembled = frames.groupBy(_._1).map { case (id, fs) =>
      id -> fs.sortBy(_._2).flatMap(_._3)
    }
    val original = ds.collect().map(f => f.mediaId -> f.payload.toSeq).toMap
    reassembled.foreach { case (id, bytes) =>
      assert(bytes.toSeq == original(id), s"media $id frames do not reassemble")
    }
  }

  test("decode runs partition-parallel with no shuffle of payloads") {
    val plan = MediaOps.extractMeta(files(8)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decode pass must not shuffle payloads:\n$plan")
  }
}
