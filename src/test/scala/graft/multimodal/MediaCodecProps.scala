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

  property("headerLength splits header from content exactly") =
    forAll(Gen.choose(1, 65535), Gen.choose(1, 65535), body) { (w, h, b) =>
      val png = MediaCodec.pngBytes(w, h, b)
      val jpg = MediaCodec.jpegBytes(w, h, b)
      // the content stream after the parsed header IS the body, byte
      // for byte, in both containers
      MediaCodec.headerLength(png).exists(o =>
        png.drop(o).sameElements(b)) &&
        MediaCodec.headerLength(jpg).exists(o => jpg.drop(o).sameElements(b))
    }

  property("content features are container-invariant and bounded") =
    forAll(Gen.choose(1, 1920), Gen.choose(1, 1080), body) { (w, h, b) =>
      val fp = MediaOps.contentFeatures(MediaCodec.pngBytes(w, h, b))
      val fj = MediaOps.contentFeatures(MediaCodec.jpegBytes(w, h, b))
      // identical body => identical content stats (components 2..7)
      // regardless of container; every component bounded in [0, 1];
      // the three class fractions cannot sum past 1
      fp.drop(2).sameElements(fj.drop(2)) &&
        fp.forall(x => x >= 0f && x <= 1f) &&
        fp(4).toDouble + fp(5) + fp(6) <= 1.0000001 &&
        fp(0) == (w / 1920.0).toFloat && fp(1) == (h / 1080.0).toFloat
    }
}
