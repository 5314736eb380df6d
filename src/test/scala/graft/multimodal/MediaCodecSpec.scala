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
