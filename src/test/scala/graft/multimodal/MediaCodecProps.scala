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
      // only a true SOI or full PNG signature prefix can ever decode —
      // anything else (including near-miss 0xff/0x89 leading bytes)
      // must return None
      val looksLike =
        b.startsWith(Array(0xff, 0xd8).map(_.toByte)) ||
          b.startsWith(MediaCodec.PngSignature)
      looksLike || MediaCodec.decodeDims(b).isEmpty
    }
}
