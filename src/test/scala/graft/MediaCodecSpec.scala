package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaCodec

/** The header parser against EXTERNAL goldens: images produced by the
  * JDK's own ImageIO writers (a PNG/JPEG encoder we did not write), so the
  * parse is checked against the real file formats, not against our own
  * synthesizer's idea of them. Plus the synth round-trip, the HeaderBytes
  * constant the q_mm_decode oracle depends on, and malformed-input
  * rejection.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def imageBytes(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // non-uniform pixels so the encoder writes a real data stream
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no JDK $format writer")
    out.toByteArray
  }

  test("golden: JDK-encoded PNG parses to its true dimensions and bit depth") {
    val h = MediaCodec.decodeHeader(imageBytes("png", 37, 23))
    assert(h === Some(MediaCodec.Header("png", 37, 23, 8)))
  }

  test("golden: JDK-encoded JPEG parses to its true dimensions and precision") {
    // ImageIO's JFIF output has APP0 + DQT + SOF + DHT segments: the
    // marker walk must skip real variable-length segments to reach SOF
    val h = MediaCodec.decodeHeader(imageBytes("jpg", 64, 48))
    assert(h === Some(MediaCodec.Header("jpeg", 64, 48, 8)))
  }

  test("synth round-trip: encoded dimensions decode back exactly") {
    for ((w, hh, d) <- Seq((0, 0, 8), (1, 1, 8), (639, 479, 16), (65535, 65535, 8))) {
      val png = MediaCodec.decodeHeader(MediaCodec.pngBytes(w, hh, d, Array[Byte](1, 2)))
      assert(png === Some(MediaCodec.Header("png", w, hh, d)))
    }
    for ((w, hh) <- Seq((0, 0), (1, 1), (639, 479), (65535, 65535))) {
      val jpg = MediaCodec.decodeHeader(MediaCodec.jpegBytes(w, hh, 8, Array[Byte](1, 2)))
      assert(jpg === Some(MediaCodec.Header("jpeg", w, hh, 8)))
    }
  }

  test("synth headers are exactly HeaderBytes long (the oracle's +33)") {
    assert(MediaCodec.pngBytes(10, 10, 8, Array.empty).length ===
      MediaCodec.HeaderBytes)
    assert(MediaCodec.jpegBytes(10, 10, 8, Array.empty).length ===
      MediaCodec.HeaderBytes)
  }

  test("synth PNG carries a valid IHDR CRC32 (spec-conformant fixture)") {
    val b = MediaCodec.pngBytes(123, 45, 8, Array.empty)
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17) // chunk type + 13 data bytes
    val stored = ((b(29) & 0xffL) << 24) | ((b(30) & 0xffL) << 16) |
      ((b(31) & 0xffL) << 8) | (b(32) & 0xffL)
    assert(stored === crc.getValue)
  }

  test("malformed inputs are rejected, not misparsed") {
    val png = MediaCodec.pngBytes(10, 10, 8, Array[Byte](1))
    val jpg = MediaCodec.jpegBytes(10, 10, 8, Array[Byte](1))
    assert(MediaCodec.decodeHeader(Array.empty) === None)
    assert(MediaCodec.decodeHeader("plain text".getBytes) === None)
    assert(MediaCodec.decodeHeader(png.take(20)) === None) // truncated IHDR
    assert(MediaCodec.decodeHeader(jpg.take(10)) === None) // truncated APP0
    // corrupt the PNG signature's last byte
    val badSig = png.clone(); badSig(7) = 0x00
    assert(MediaCodec.decodeHeader(badSig) === None)
    // JPEG whose stream hits SOS before any SOF: frameless
    val frameless = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 0x00).map(_.toByte)
    assert(MediaCodec.decodeHeader(frameless) === None)
    // segment with an impossible length field must not loop or throw
    val badLen = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01).map(_.toByte)
    assert(MediaCodec.decodeHeader(badLen) === None)
  }

  test("SOF variants and fill bytes: progressive marker and FF padding parse") {
    // hand-built stream: SOI, fill bytes, COM segment, SOF2 (progressive)
    val sof2 = Array[Int](
      0xff, 0xd8, // SOI
      0xff, 0xff, 0xff, 0xfe, 0x00, 0x04, 'h', 'i', // fill bytes + COM(len 4)
      0xff, 0xc2, 0x00, 0x0b, 12, 0x01, 0x00, 0x02, 0x00, 0x01, 0x01, 0x11, 0x00
    ).map(_.toByte)
    assert(MediaCodec.decodeHeader(sof2) ===
      Some(MediaCodec.Header("jpeg", 512, 256, 12)))
  }
}
