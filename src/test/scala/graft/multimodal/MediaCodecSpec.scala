package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecSpec extends AnyFunSuite {

  test("PNG header round-trips dimensions through the bytes") {
    val p = MediaCodec.pngBytes(1920, 1080, Array[Byte](1, 2, 3))
    assert(MediaCodec.decodeDims(p) == Some((1920, 1080)))
    assert(p.length == 33 + 3)
    // signature + IHDR type tag sit where the spec says
    assert(p.take(8).sameElements(MediaCodec.PngSignature))
    assert(new String(p.slice(12, 16), "US-ASCII") == "IHDR")
  }

  test("JPEG header round-trips dimensions through the bytes") {
    val j = MediaCodec.jpegBytes(640, 480, Array.emptyByteArray)
    assert(MediaCodec.decodeDims(j) == Some((640, 480)))
    assert(j.length == 15)
  }

  test("JPEG segment walk skips APP0 before SOF") {
    // SOI, APP0 (4-byte segment), then a SOF0 for 33x17
    val app0 = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte)
    val sof = MediaCodec.jpegBytes(33, 17, Array.emptyByteArray).drop(2)
    val bytes = Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ sof
    assert(MediaCodec.decodeDims(bytes) == Some((33, 17)))
  }

  test("JPEG walk tolerates fill bytes and standalone markers (T.81 B.1.1.2)") {
    val sof = MediaCodec.jpegBytes(12, 34, Array.emptyByteArray).drop(2)
    // SOI, two fill 0xFFs before a TEM, then a standalone RST0, then SOF
    val bytes = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0x01, 0xff, 0xd0)
      .map(_.toByte) ++ sof
    assert(MediaCodec.decodeDims(bytes) == Some((12, 34)))
    // EOI before any SOF -> None, not a bogus parse
    assert(MediaCodec.decodeDims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  test("WAV header round-trips duration through fmt/data chunk math") {
    val body = new Array[Byte](16000 * 2 * 2) // 2 s of 16-bit mono @16kHz
    val w = MediaCodec.wavBytes(16000, 1, 16, body)
    assert(w.length == 44 + body.length)
    assert(new String(w.take(4), "US-ASCII") == "RIFF")
    assert(new String(w.slice(8, 12), "US-ASCII") == "WAVE")
    assert(MediaCodec.decodeDurationMs(w) == Some(2000L))
    assert(MediaCodec.headerLength(w) == Some(44))
    // stereo halves the duration for the same byte count
    assert(MediaCodec.decodeDurationMs(
      MediaCodec.wavBytes(16000, 2, 16, body)) == Some(1000L))
  }

  test("WAV chunk walk skips an unknown odd-sized chunk with its pad byte") {
    val w = MediaCodec.wavBytes(8000, 1, 16, new Array[Byte](16000))
    // splice a 3-byte LIST chunk (padded to 4) between WAVE and fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = w.take(12) ++ extra ++ w.drop(12)
    assert(MediaCodec.decodeDurationMs(spliced) == Some(1000L))
    assert(MediaCodec.headerLength(spliced) == Some(44 + extra.length))
  }

  test("MP4 mvhd round-trips duration for version 0 and 1") {
    val m0 = MediaCodec.mp4Bytes(600, 3000, Array[Byte](9, 9))
    assert(m0.length == 144 + 2)
    assert(MediaCodec.decodeDurationMs(m0) == Some(5000L))
    assert(MediaCodec.headerLength(m0) == Some(144))
    val m1 = MediaCodec.mp4Bytes(90000, 450000L, Array.emptyByteArray, version = 1)
    assert(MediaCodec.decodeDurationMs(m1) == Some(5000L))
    // timescale larger than Int range of ticks: stays exact in Long
    assert(MediaCodec.decodeDurationMs(
      MediaCodec.mp4Bytes(1000, 0x100000000L, Array.emptyByteArray, version = 1))
      == Some(0x100000000L))
  }

  test("non-image payloads return None instead of garbage") {
    assert(MediaCodec.decodeDims("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decodeDims(Array.emptyByteArray).isEmpty)
    // truncated JPEG: SOI then nothing parseable
    assert(MediaCodec.decodeDims(Array(0xff, 0xd8, 0x00, 0x01).map(_.toByte)).isEmpty)
    // PNG signature but a non-IHDR first chunk
    val bad = MediaCodec.PngSignature ++ Array.fill[Byte](16)(0x41)
    assert(MediaCodec.decodeDims(bad).isEmpty)
  }
}
