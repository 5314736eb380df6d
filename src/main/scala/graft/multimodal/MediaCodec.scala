package graft.multimodal

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Minimal pure-JVM media header codec for the decode boundary —
  * PUBLIC format knowledge only: the PNG signature + IHDR chunk
  * layout (W3C PNG spec §11.2.2), the JPEG SOF frame-header layout
  * (ITU-T T.81 §B.2.2), the RIFF/WAVE fmt + data chunk layout
  * (Microsoft/IBM WAVE spec, RIFF 1991), and the ISO BMFF box walk to
  * the mvhd movie header (ISO/IEC 14496-12 §8.2.2). Encoding exists
  * to plant REAL headers on the text fixture; decoding reads
  * dimensions and durations back from the bytes alone — no codec
  * libraries involved, which is exactly what a 100 TB
  * metadata-extraction pass wants: dimensions come from the first few
  * hundred bytes without decompressing pixel/sample data.
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

  // ---- REAL pixel codec (javax.imageio — pure JVM, public API) ------

  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false) // no tmp-file churn per task

  /** Encode a REAL deflate-compressed 8-bit GRAYSCALE PNG. Pixel
    * values land in the raster directly (never through `getRGB`'s
    * gray->sRGB colorspace transform, which is NOT the identity), so
    * `decodeLuma` recovers every value EXACTLY — the property the
    * q296 oracle replay rests on. */
  def pngEncodeGray(width: Int, height: Int, lum: Array[Int]): Array[Byte] = {
    imageIoInit
    require(lum.length == width * height,
      s"luminance grid ${lum.length} for ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, lum(y * width + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The same pixels as an RGB PNG (r = g = b = luminance): a
    * BYTE-DIFFERENT, PIXEL-IDENTICAL re-encode — decoded luma
    * (299r + 587g + 114b) / 1000 collapses exactly to the gray value,
    * so perceptual hashes of the two encodings must be equal. */
  def pngEncodeRgbGray(width: Int, height: Int,
      lum: Array[Int]): Array[Byte] = {
    imageIoInit
    require(lum.length == width * height,
      s"luminance grid ${lum.length} for ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = lum(y * width + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** TRUE pixel decode: run the payload through the registered
    * ImageIO readers (PNG/JPEG/GIF/BMP in every JVM) and return the
    * (width, height, luminance) grid. Luma reads RASTER samples —
    * single-band rasters verbatim (exact for grayscale), multi-band
    * as integer ITU-R 601 luma (299r + 587g + 114b) / 1000, which is
    * exact whenever r = g = b. None when no reader decodes the bytes
    * (the synthetic header-only fixtures take this path and fall back
    * to the byte-stream hash). */
  def decodeLuma(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      imageIoInit
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val bands = raster.getNumBands
        val lum = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            lum(y * w + x) =
              if (bands == 1) raster.getSample(x, y, 0)
              else if (bands >= 3)
                (299 * raster.getSample(x, y, 0) +
                  587 * raster.getSample(x, y, 1) +
                  114 * raster.getSample(x, y, 2)) / 1000
              else raster.getSample(x, y, 0) // gray + alpha
            x += 1
          }
          y += 1
        }
        Some((w, h, lum))
      }
    } catch { case _: Exception => None }

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

  /** RIFF/WAVE: "RIFF" + riffSize + "WAVE", a canonical 16-byte PCM
    * fmt chunk, then `body` as the data-chunk payload (the sample
    * stream, opaque here). Header is exactly 44 bytes; no pad byte is
    * appended for odd body lengths since data is the final chunk. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      body: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val out = ByteBuffer.allocate(44 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1.toShort)                        // PCM
    out.putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
    out.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(body.length)
    out.put(body)
    out.array()
  }

  /** ISO BMFF (MP4): ftyp (20 bytes) + moov carrying one mvhd with
    * the given timescale/duration (version 0 or 1) + mdat holding
    * `body`. Header before the mdat payload is 144 bytes for v0 (156
    * for v1, whose mvhd carries 64-bit times). */
  def mp4Bytes(timescale: Int, durationTicks: Long, body: Array[Byte],
      version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, s"mvhd version $version")
    val mvhdLen = if (version == 0) 108 else 120
    val out = ByteBuffer.allocate(20 + 8 + mvhdLen + 8 + body.length)
    out.putInt(20).put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")).putInt(0x200)
    out.put("isom".getBytes("US-ASCII"))
    out.putInt(8 + mvhdLen).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdLen).put("mvhd".getBytes("US-ASCII"))
    out.put(version.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    if (version == 0) {
      out.putInt(0).putInt(0)                      // creation/modification
      out.putInt(timescale).putInt(durationTicks.toInt)
    } else {
      out.putLong(0L).putLong(0L)
      out.putInt(timescale).putLong(durationTicks)
    }
    out.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    out.putShort(0.toShort).putInt(0).putInt(0)     // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(out.putInt)
    (0 until 6).foreach(_ => out.putInt(0))         // pre_defined
    out.putInt(1)                                   // next_track_ID
    out.putInt(8 + body.length).put("mdat".getBytes("US-ASCII"))
    out.put(body)
    out.array()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def i32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def u32(b: Array[Byte], i: Int): Long = i32(b, i) & 0xffffffffL

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 24 && p.take(8).sameElements(PngSignature) &&
      new String(p.slice(12, 16), "US-ASCII") == "IHDR"

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 && fourcc(p, 0) == "RIFF" && fourcc(p, 8) == "WAVE"

  private def isMp4(p: Array[Byte]): Boolean =
    p.length >= 8 && fourcc(p, 4) == "ftyp"

  /** RIFF chunk walk: (byteRate from fmt, data-payload offset,
    * data-payload length). Chunk sizes are attacker-controlled bytes —
    * walked in Long arithmetic with the RIFF odd-size pad byte
    * honored, and any truncated/overflowing chunk aborts to None. */
  private def wavInfo(p: Array[Byte]): Option[(Long, Int, Long)] = {
    var byteRate = -1L
    var i = 12L
    while (i + 8 <= p.length) {
      val id = fourcc(p, i.toInt)
      val size = le32(p, i.toInt + 4)
      if (size < 0 || i + 8 + size > p.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        byteRate = le32(p, i.toInt + 8 + 8)
      } else if (id == "data") {
        if (byteRate <= 0) return None // fmt must precede data (spec)
        return Some((byteRate, i.toInt + 8, size))
      }
      i += 8 + size + (size % 2) // chunks pad to even byte boundaries
    }
    None
  }

  /** ISO BMFF box walk over `[from, until)`: returns the (payload
    * offset, payload length) of the first box named `name`. 64-bit
    * largesize boxes are honored; size-0 ("to end of file") only at
    * top level. */
  private def findBox(p: Array[Byte], from: Int, until: Int,
      name: String, topLevel: Boolean = false): Option[(Int, Int)] = {
    // size==0 ("box extends to end of FILE", ISO 14496-12 §4.2) is
    // only defined for the last TOP-LEVEL box; honoring it while
    // walking a container's children (as `until` alone cannot tell —
    // the last top-level box's children also end at p.length) would
    // let a crafted nested size-0 box swallow the rest of its parent
    var i = from.toLong
    while (i + 8 <= until) {
      val size0 = u32(p, i.toInt)
      val typ = fourcc(p, i.toInt + 4)
      val (payloadOff, boxEnd) =
        if (size0 == 1) {
          if (i + 16 > until) return None
          (i + 16, i + u64(p, i.toInt + 8))
        } else if (size0 == 0) {
          if (!topLevel) return None
          (i + 8, until.toLong)
        }
        else (i + 8, i + size0)
      if (boxEnd < payloadOff || boxEnd > until) return None
      if (typ == name)
        return Some((payloadOff.toInt, (boxEnd - payloadOff).toInt))
      i = boxEnd
    }
    None
  }

  /** mvhd read: (timescale, durationTicks), version 0 and 1. */
  private def mp4Mvhd(p: Array[Byte]): Option[(Long, Long)] =
    findBox(p, 0, p.length, "moov", topLevel = true).flatMap { case (mOff, mLen) =>
      findBox(p, mOff, mOff + mLen, "mvhd").flatMap { case (off, len) =>
        val version = p(off) & 0xff
        if (version == 0 && len >= 24)
          Some((u32(p, off + 12), u32(p, off + 16)))
        else if (version == 1 && len >= 32)
          Some((u32(p, off + 20), u64(p, off + 24)))
        else None
      }
    }

  /** Duration in milliseconds, parsed from the container bytes alone:
    * WAV = data-chunk length over the fmt chunk's byte rate; MP4 =
    * mvhd duration ticks over the mvhd timescale. None for payloads
    * that are neither (images report duration through their own
    * path), or whose headers are malformed. */
  def decodeDurationMs(p: Array[Byte]): Option[Long] = {
    if (isWav(p))
      wavInfo(p).collect { case (byteRate, _, dataLen) if byteRate > 0 =>
        dataLen * 1000L / byteRate
      }
    else if (isMp4(p))
      mp4Mvhd(p).collect { case (timescale, ticks) if timescale > 0 =>
        ticks * 1000L / timescale
      }
    else None
  }

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

  // ---- VIDEO: concatenated-PNG ticks in the mdat ---------------------
  // The MJPEG-in-container shape with PNG ticks (the codec this
  // container already decodes for real): one MP4 whose mdat payload
  // is N complete PNG streams back to back, one per frame. Frame
  // extraction walks REAL PNG chunk structure (length + type + CRC
  // through IEND) — no tick index rides outside the frames
  // themselves, so a consumer must genuinely parse the stream.

  /** Length of ONE complete PNG stream starting at `off` (signature +
    * chunks through IEND incl. its CRC); None when `off` is not a PNG
    * start or the stream is truncated/corrupt. Length fields are
    * untrusted: Long arithmetic, negatives rejected. */
  def pngStreamLength(p: Array[Byte], off: Int): Option[Int] = {
    if (off < 0 || off + 8 > p.length) return None
    var i = 0
    while (i < 8) {
      if (p(off + i) != PngSignature(i)) return None
      i += 1
    }
    var pos = off + 8
    while (pos + 8 <= p.length) {
      val len = i32(p, pos).toLong
      if (len < 0) return None
      val next = pos.toLong + 8 + len + 4
      if (next > p.length) return None
      val isEnd = p(pos + 4) == 'I' && p(pos + 5) == 'E' &&
        p(pos + 6) == 'N' && p(pos + 7) == 'D'
      pos = next.toInt
      if (isEnd) return Some(pos - off)
    }
    None
  }

  /** Build a video: MP4 container, mdat = the concatenated frames. */
  def videoBytes(timescale: Int, durationTicks: Long,
      frames: Seq[Array[Byte]]): Array[Byte] =
    mp4Bytes(timescale, durationTicks, frames.toArray.flatten)

  /** The frame ticks of a concatenated-PNG video: byte slices of each
    * complete PNG in the mdat payload. Some only when the ENTIRE mdat
    * parses as consecutive PNG streams (an MP4 whose mdat holds
    * anything else — the header-only synthetic fixtures — is not a
    * tick stream and yields None). */
  def videoFrames(p: Array[Byte]): Option[Vector[Array[Byte]]] =
    if (!isMp4(p)) None
    else headerLength(p).flatMap { start =>
      val out = Vector.newBuilder[Array[Byte]]
      var pos = start
      var bad = false
      while (!bad && pos < p.length) {
        pngStreamLength(p, pos) match {
          case Some(len) =>
            out += java.util.Arrays.copyOfRange(p, pos, pos + len)
            pos += len
          case None => bad = true
        }
      }
      val frames = out.result()
      if (bad || frames.isEmpty) None else Some(frames)
    }

  /** Container-header length: the offset where the content stream
    * starts — after the IHDR chunk (signature + length + type + data +
    * CRC) for PNG, after the first SOF segment for JPEG, at the data
    * chunk's payload for WAV, at the mdat box's payload for MP4. Lets
    * feature extraction run over CONTENT bytes only, excluding bytes
    * that only describe the container. None for unrecognized payloads
    * (callers treat the whole payload as content). Length fields are
    * attacker-controlled bytes: computed in Long arithmetic and
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
    } else if (isWav(p)) wavInfo(p).map { case (_, dataOff, _) => dataOff }
    else if (isMp4(p)) findBox(p, 0, p.length, "mdat", topLevel = true).map(_._1)
    else None
  }

  /** One-walk combined parse: (width, height, headerLength) — width
    * and height are 0 for the time-based containers (WAV/MP4). The
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
    } else if (isWav(p) || isMp4(p)) headerLength(p).map(off => (0, 0, off))
    else None
  }
}
