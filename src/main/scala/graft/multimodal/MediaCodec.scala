package graft.multimodal

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Minimal pure-JVM image header codec for the decode boundary —
  * PUBLIC format knowledge only: the PNG signature + IHDR chunk
  * layout (W3C PNG spec §11.2.2) and the JPEG SOF frame-header
  * layout (ITU-T T.81 §B.2.2). Encoding exists to plant REAL headers
  * on the text fixture; decoding reads dimensions back from the bytes
  * alone — no codec libraries involved, which is exactly what a
  * 100 TB metadata-extraction pass wants: dimensions come from the
  * first few hundred bytes without decompressing pixel data.
  */
object MediaCodec {

  val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: signature + a real IHDR chunk (13-byte payload, CRC32 over
    * chunk type + data), then `body` as opaque trailing bytes.
    * Header is exactly 33 bytes. */
  def pngBytes(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val ihdr = ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)                             // bit depth
    ihdr.put(2.toByte)                             // color type: truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val crc = new CRC32
    crc.update(ihdr.array())
    val out = ByteBuffer.allocate(33 + body.length)
    out.put(PngSignature).putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
    out.put(body)
    out.array()
  }

  /** JPEG: SOI + one SOF0 frame header (8-bit precision, single
    * component), then `body` as opaque trailing bytes. Header is
    * exactly 15 bytes. */
  def jpegBytes(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(15 + body.length)
    out.put(0xff.toByte).put(0xd8.toByte)          // SOI
    out.put(0xff.toByte).put(0xc0.toByte)          // SOF0
    out.putShort(11.toShort)                       // segment length
    out.put(8.toByte)                              // sample precision
    out.putShort(height.toShort).putShort(width.toShort)
    out.put(1.toByte)                              // component count
    out.put(1.toByte).put(0x11.toByte).put(0.toByte) // id / sampling / quant
    out.put(body)
    out.array()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def i32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 24 && p.take(8).sameElements(PngSignature) &&
      new String(p.slice(12, 16), "US-ASCII") == "IHDR"

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

  /** Marker-segment walk to the first SOF marker: returns the index of
    * the SOF marker byte (the byte after its 0xFF prefix run), or None
    * when the stream ends / hits EOI first. */
  private def jpegSofIndex(p: Array[Byte]): Option[Int] = {
    var i = 2
    while (i + 1 < p.length && (p(i) & 0xff) == 0xff) {
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
      var j = i + 1
      while (j < p.length && (p(j) & 0xff) == 0xff) j += 1
      if (j >= p.length) return None
      val marker = p(j) & 0xff
      if (marker == 0xd9) return None // EOI: no frame header found
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        i = j + 1 // TEM / RSTn / SOI: standalone, no length field
      } else {
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) return Some(j)
        if (j + 3 > p.length) return None // truncated length field
        i = j + 1 + u16(p, j + 1) // skip payload (length includes itself)
      }
    }
    None
  }

  /** Parse (width, height) out of PNG IHDR bytes or a JPEG SOF
    * segment (walking marker segments, so APP0/EXIF prefixes are
    * skipped); None when the payload is neither — callers fall back
    * to their non-image handling. */
  def decodeDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (isPng(p)) Some((i32(p, 16), i32(p, 20)))
    else if (isJpeg(p)) jpegSofIndex(p).flatMap { j =>
      if (j + 8 > p.length) None // truncated frame header
      else Some((u16(p, j + 6), u16(p, j + 4)))
    } else None
  }

  /** Container-header length: the offset where the content stream
    * starts — after the IHDR chunk (signature + length + type + data +
    * CRC) for PNG, after the first SOF segment for JPEG. Lets feature
    * extraction run over CONTENT bytes only, excluding bytes that only
    * describe the container. None for non-image payloads (callers
    * treat the whole payload as content). The PNG chunk-length field
    * is attacker-controlled bytes: computed in Long arithmetic and
    * rejected when negative, so a crafted length can never produce a
    * negative offset (which would crash the feature loop). */
  def headerLength(p: Array[Byte]): Option[Int] = {
    if (isPng(p)) {
      val chunkLen = i32(p, 8).toLong
      if (chunkLen < 0) None
      else Some(math.min(p.length.toLong, 8L + 4 + 4 + chunkLen + 4).toInt)
    } else if (isJpeg(p)) jpegSofIndex(p).flatMap { j =>
      if (j + 3 > p.length) None
      else Some(math.min(p.length, j + 1 + u16(p, j + 1)))
    } else None
  }

  /** One-walk combined parse: (width, height, headerLength). The
    * per-row feature path uses this so the JPEG marker walk / PNG
    * header parse runs once per payload, not once for dims and again
    * for the header length. */
  def decodeHeader(p: Array[Byte]): Option[(Int, Int, Int)] = {
    if (isPng(p)) {
      headerLength(p).map(off => (i32(p, 16), i32(p, 20), off))
    } else if (isJpeg(p)) jpegSofIndex(p).flatMap { j =>
      if (j + 8 > p.length) None
      else Some((u16(p, j + 6), u16(p, j + 4),
        math.min(p.length, j + 1 + u16(p, j + 1))))
    } else None
  }
}
