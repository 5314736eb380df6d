package graft.multimodal

import graft.SparkTestBase
import graft.queries.MultimodalQueries

import org.apache.spark.sql.functions._

/** Perceptual-hash (dHash) image near-dup: hash shape, planted-pair
  * recall, and the banding plan discipline (equi-joins only — q32's
  * no-cartesian contract applied to the Hamming buckets). */
class ImagePhashSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("dHash is deterministic, header-independent, and 16-bit banded") {
    import spark.implicits._
    val body = ("the quick brown fox jumps over the lazy dog " * 8)
      .getBytes("UTF-8")
    // same content stream under different containers/dims must hash
    // identically: the hash reads the DECODED stream, not the header
    val files = Seq(
      MediaFile(1L, "image/png", MediaCodec.pngBytes(100, 50, body)),
      MediaFile(2L, "image/jpeg", MediaCodec.jpegBytes(640, 480, body)),
      MediaFile(3L, "image/png", MediaCodec.pngBytes(1, 1, body)))
      .toDS()
    val got = MediaOps.imageDHash(files).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.distinct.length == 1,
      s"container header leaked into the hash: ${got.mkString(", ")}")
    got.head.productIterator.foreach { b =>
      val v = b.asInstanceOf[Long]
      assert(v >= 0 && v < 65536, s"band out of 16-bit range: $v")
    }
    // and a genuinely different stream hashes differently
    val other = MediaOps.imageDHash(Seq(MediaFile(9L, "image/png",
      MediaCodec.pngBytes(100, 50,
        body.reverse))).toDS()).collect().head
    assert((other.getLong(1), other.getLong(2), other.getLong(3),
      other.getLong(4)) != got.head)
  }

  test("REAL pixel decode: a re-encoded (byte-different, pixel-identical) image hashes EQUAL") {
    import spark.implicits._
    val lum = Array.tabulate(40 * 30)(i => (i * 37 + 11) % 256)
    val gray = MediaCodec.pngEncodeGray(40, 30, lum)
    val rgb = MediaCodec.pngEncodeRgbGray(40, 30, lum)
    // genuinely different BYTES (different PNG color type + streams)
    assert(!java.util.Arrays.equals(gray, rgb),
      "the two encodings must differ on disk")
    assert(gray.length != lum.length + 33,
      "pngEncodeGray must produce a real compressed PNG, not header+raw")
    // ... and a real decoder round-trips the exact pixels
    val (dw, dh, dlum) = MediaCodec.decodeLuma(gray).get
    assert((dw, dh) == ((40, 30)) && dlum.sameElements(lum),
      "grayscale PNG decode must be pixel-exact")
    val files = Seq(
      MediaFile(1L, "image/png", gray),
      MediaFile(2L, "image/png", rgb)).toDS()
    val got = MediaOps.imageDHash(files).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == got(2L),
      s"pixel-identical re-encodes must hash equal: $got")
    // while genuinely different PIXELS (inverted luminance flips every
    // strict gradient) move the hash
    val inverted = lum.map(255 - _)
    val fl = MediaOps.imageDHash(Seq(MediaFile(3L, "image/png",
      MediaCodec.pngEncodeGray(40, 30, inverted))).toDS()).collect().head
    assert((fl.getLong(1), fl.getLong(2), fl.getLong(3), fl.getLong(4))
      != got(1L), "a real pixel edit must move the hash")
  }

  test("one-pixel plants corrupt at most 1 band, so banding recall is total") {
    val pairs = MultimodalQueries.imagePhashPairs(spark, dir)
    pairs.cache()
    val plantPairs = pairs
      .where(col("id_b") === col("id_a") + 10000000L).collect()
    // every planted copy (doc_id % 4 == 0, doc_id < 240 -> 60 plants)
    assert(plantPairs.length == 60,
      s"expected all 60 planted pairs, got ${plantPairs.length}")
    assert(plantPairs.forall(_.getLong(2) <= 1),
      "a one-pixel flip feeds only region (0,0), hence only bit (0,0)")
  }

  test("audio fingerprint: LE16 decode is signed, and one-sample plants all surface") {
    import spark.implicits._
    // bytes chosen so the high byte sets the sign bit: 0x80 0xff ->
    // raw 0xff80 = 65408 -> signed -128, |s| = 128 (an unsigned read
    // would score 65408 and shift every window energy)
    val neg = Array.fill(40)(Array(0x80.toByte, 0xff.toByte)).flatten
    val pos = Array.fill(40)(Array(0x80.toByte, 0x00.toByte)).flatten // +128
    val files = Seq(
      MediaFile(1L, "audio/wav", MediaCodec.wavBytes(8000, 1, 16, neg)),
      MediaFile(2L, "audio/wav", MediaCodec.wavBytes(8000, 1, 16, pos)))
      .toDS()
    val fp = MediaOps.audioFingerprint(files).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(fp(1L) == fp(2L),
      "|−128| must fingerprint like |+128| — the signed decode is wrong")

    val pairs = MultimodalQueries.audioFingerprintPairs(spark, dir)
    val plantPairs = pairs
      .where(col("id_b") === col("id_a") + 10000000L)
      .collect()
    assert(plantPairs.length == 60,
      s"expected all 60 planted audio pairs, got ${plantPairs.length}")
    assert(plantPairs.forall(_.getLong(2) <= 2),
      "a one-byte edit moved more than one window")
  }

  test("banding candidates come from equi-joins: no cartesian product in the plan") {
    val plan = MultimodalQueries.imagePhashPairs(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tile grain recalls CROPS: a quadrant crop matches its source at hamming 0") {
    val pairs = MultimodalQueries.imageTilePairs(spark, dir).cache()
    // every planted crop (doc_id % 4 == 0, doc_id < 240 -> 60 plants)
    // surfaces against its source; the crop's FULL frame (tile 0)
    // equals the source's bottom-right quadrant (tile 4) exactly
    val plantPairs = pairs
      .where(col("id_b") === col("id_a") + 30000000L)
      .where(col("tile_a") === 4 && col("tile_b") === 0)
      .collect()
    assert(plantPairs.length == 60,
      s"expected all 60 crop pairs at (tile 4, tile 0), got ${plantPairs.length}")
    assert(plantPairs.forall(_.getLong(4) == 0L),
      "a pixel-exact crop must hash identically in tile-local coords")
    // and the WHOLE-IMAGE hash cannot see crops: no q296-style pair
    // links a crop to its source at the full-frame grain with both
    // geometries intact (dims differ, regions differ)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("degenerate band buckets are capped: a planted hot band yields bounded candidates") {
    import spark.implicits._
    // 50 fingerprints sharing EVERY band (the constant-image
    // degenerate): uncapped they produce 50*49/2 hamming-0 pairs —
    // quadratic in bucket occupancy, which grows linearly with the
    // corpus on a 65,536-value band space
    val hot = (1L to 50L).map(i => (i, 7L, 7L, 7L, 7L))
    // plus one genuine near-dup pair in its own (cold) buckets
    val pair = Seq((100L, 1L, 2L, 3L, 4L), (101L, 1L, 2L, 3L, 5L))
    val bands = (hot ++ pair)
      .toDF("media_id", "b0", "b1", "b2", "b3")

    val uncapped = MultimodalQueries
      .bandedHammingPairs(bands, maxBucketSize = Int.MaxValue).collect()
    assert(uncapped.length == 50 * 49 / 2 + 1,
      s"uncapped baseline wrong: ${uncapped.length}")

    val capped = MultimodalQueries
      .bandedHammingPairs(bands, maxBucketSize = 8).collect()
    assert(capped.length == 1 &&
      capped.head.getLong(0) == 100L && capped.head.getLong(1) == 101L,
      s"hot bucket must be dropped, cold pair kept: ${capped.mkString(", ")}")

    // tile grain: same guard, bucket = (image, tile) rows per band value
    val hotT = (1L to 50L).map(i => (i, 0, 7L, 7L, 7L, 7L))
    val pairT = Seq((100L, 2, 1L, 2L, 3L, 4L), (101L, 0, 1L, 2L, 3L, 5L))
    val tiles = (hotT ++ pairT)
      .toDF("media_id", "tile", "b0", "b1", "b2", "b3")
    val cappedT = MultimodalQueries
      .tileBandedPairs(tiles, maxBucketSize = 8).collect()
    assert(cappedT.length == 1 && cappedT.head.getLong(0) == 100L,
      s"tile hot bucket must be dropped, cold pair kept: ${cappedT.mkString(", ")}")
    val uncappedT = MultimodalQueries
      .tileBandedPairs(tiles, maxBucketSize = Int.MaxValue).collect()
    assert(uncappedT.length == 50 * 49 / 2 + 1)
  }
}
