package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Header encode -> decode must round-trip ANY dimension the format
  * can carry, with arbitrary trailing bytes. */
object MediaCodecProps extends Properties("MediaCodec") {

  private val body: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("PNG round-trips any positive 31-bit dimensions") =
    forAll(Gen.choose(1, Int.MaxValue), Gen.choose(1, Int.MaxValue), body) {
      (w, h, b) =>
        MediaCodec.decodeDims(MediaCodec.pngBytes(w, h, b)).contains((w, h))
    }

  property("JPEG round-trips any 16-bit dimensions") =
    forAll(Gen.choose(1, 65535), Gen.choose(1, 65535), body) { (w, h, b) =>
      MediaCodec.decodeDims(MediaCodec.jpegBytes(w, h, b)).contains((w, h))
    }

  property("arbitrary non-image bytes never decode") =
    forAll(body) { b =>
      // exclude the 1-in-2^16+ chance of a generated JPEG/PNG prefix
      val looksLike = b.length >= 2 &&
        ((b(0) & 0xff) == 0xff || (b(0) & 0xff) == 0x89)
      looksLike || MediaCodec.decodeDims(b).isEmpty
    }
}
