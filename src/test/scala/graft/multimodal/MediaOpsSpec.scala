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

  test("feature vectors have the requested dim and bounded values") {
    val feats = MediaOps.extractFeatures(files(10), dim = 48).collect()
    assert(feats.length == 10)
    feats.foreach { f =>
      assert(f.feature.length == 48)
      assert(f.feature.forall(x => x >= -1.0f && x < 1.0f))
    }
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
