package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Pure-JVM media header codec for the multimodal column path
  * (SURVEY.md §2.11): REAL byte-level parsing of PNG IHDR and JPEG SOF
  * headers — width / height / bit depth straight from the container bytes,
  * no codec library — plus deterministic encoders used to synthesize
  * fixture blobs. Full pixel decode still needs an image library the
  * container lacks; header decode does not, and it is the part a curation
  * pipeline actually filters on (resolution/bit-depth gates) before paying
  * for pixels.
  *
  * Everything here is per-row, allocation-light, and called from batched
  * `mapPartitions` ([[MultimodalOps]]) — scan-local at 100 TB.
  *
  * Formats (public specs): PNG — 8-byte signature then the IHDR chunk
  * (13-byte payload: width u32be, height u32be, bit depth u8, color type
  * u8, ...). JPEG/JFIF — 0xFFD8 SOI then marker segments (0xFF id len16be
  * payload); the frame header (SOF0/SOF2 and siblings) carries precision
  * u8, height u16be, width u16be.
  */
object MediaCodec {

  final case class Header(format: String, width: Int, height: Int, bitDepth: Int)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Parse a media header if the blob is a recognized container; None for
    * anything else (the caller's fallback path handles unknown formats).
    */
  def decodeHeader(blob: Array[Byte]): Option[Header] =
    pngHeader(blob).orElse(jpegHeader(blob))

  /** PNG: signature + first chunk must be IHDR (per spec it always is);
    * width/height/bit depth sit at fixed offsets inside it.
    */
  private def pngHeader(b: Array[Byte]): Option[Header] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w < 0 || h < 0) return None
    Some(Header("png", w, h, b(24) & 0xff))
  }

  /** JPEG: walk the marker-segment chain from SOI to the first frame
    * header (any SOF0..SOF15 except the non-frame C4/C8/CC ids), skipping
    * fill bytes and standalone markers. Hitting SOS or EOI first means a
    * frameless stream — not a decodable image header.
    */
  private def jpegHeader(b: Array[Byte]): Option[Header] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      // 0xFF fill bytes may pad before the marker id
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val m = b(i + 1) & 0xff
      if (isSof(m)) {
        // segment: len(2) precision(1) height(2) width(2) ...
        if (i + 9 > b.length) return None
        return Some(Header("jpeg", be16(b, i + 7), be16(b, i + 5), b(i + 4) & 0xff))
      } else if (m == 0xd9 || m == 0xda) {
        return None
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else {
        if (i + 4 > b.length) return None
        val len = be16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Fixture-grade PNG: real signature + spec-exact IHDR (valid CRC32), the
    * payload standing in for the IDAT stream. Header is exactly 33 bytes —
    * [[MultimodalOps]]' oracle arithmetic depends on that constant.
    */
  def pngBytes(width: Int, height: Int, bitDepth: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(33 + payload.length)
    out.write(PngSig, 0, 8)
    val chunk = new Array[Byte](17) // "IHDR" + 13 data bytes
    chunk(0) = 'I'; chunk(1) = 'H'; chunk(2) = 'D'; chunk(3) = 'R'
    putBe32(chunk, 4, width)
    putBe32(chunk, 8, height)
    chunk(12) = bitDepth.toByte
    chunk(13) = 6 // color type RGBA
    // compression / filter / interlace = 0
    val len = new Array[Byte](4); putBe32(len, 0, 13)
    out.write(len, 0, 4)
    out.write(chunk, 0, 17)
    val crc = new CRC32; crc.update(chunk, 0, 17)
    val crcB = new Array[Byte](4); putBe32(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Fixture-grade JPEG/JFIF: SOI + 16-byte APP0 (so the parser's segment
    * walk is exercised, not just offset math) + single-component SOF0, the
    * payload standing in for the entropy-coded stream. Header is exactly
    * 33 bytes (2 + 18 + 13).
    */
  def jpegBytes(width: Int, height: Int, precision: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(width >= 0 && width <= 0xffff && height >= 0 && height <= 0xffff,
      s"JPEG dimensions are u16: ${width}x$height")
    val out = new ByteArrayOutputStream(33 + payload.length)
    out.write(Array(0xff, 0xd8).map(_.toByte), 0, 2) // SOI
    val app0 = Array[Int](
      0xff, 0xe0, 0x00, 0x10, // APP0, len 16
      'J', 'F', 'I', 'F', 0, // identifier
      0x01, 0x01, // version 1.1
      0x00, // units: none
      0x00, 0x01, 0x00, 0x01, // density 1x1
      0x00, 0x00 // no thumbnail
    ).map(_.toByte)
    out.write(app0, 0, app0.length)
    val sof = Array[Int](
      0xff, 0xc0, 0x00, 0x0b, // SOF0, len 11 (1 component)
      precision,
      (height >> 8) & 0xff, height & 0xff,
      (width >> 8) & 0xff, width & 0xff,
      0x01, // 1 component
      0x01, 0x11, 0x00 // id, 1x1 sampling, quant table 0
    ).map(_.toByte)
    out.write(sof, 0, sof.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  /** Bytes a synthesized header adds ahead of the payload (both formats). */
  val HeaderBytes = 33

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
}
