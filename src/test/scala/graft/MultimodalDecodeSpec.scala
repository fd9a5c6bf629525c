package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps
import graft.ops.MultimodalOps.MediaRow

/**
 * The REAL half of the multimodal decode: container-header parsing over
 * hand-built binaries (no codec library involved — headers are pure byte
 * layouts). Each blob below is constructed byte-for-byte from its format
 * specification, so a parser bug cannot hide behind a library.
 */
class MultimodalDecodeSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def be32(v: Int) = bytes(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
  private def le32(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24)
  private def le16(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff)
  private def be16(v: Int) = bytes((v >> 8) & 0xff, v & 0xff)
  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("PNG: IHDR width/height (big-endian)") {
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ ascii("IHDR") ++ be32(1920) ++ be32(1080) ++
      bytes(8, 6, 0, 0, 0) ++ be32(0) // bit depth etc + fake CRC
    assert(MultimodalOps.sniffDecode(png) === Some(("png", 1920, 1080, 1)))
  }

  test("JPEG: marker walk to SOF0 across a leading APP0 segment") {
    val app0 = bytes(0xff, 0xe0) ++ be16(16) ++ ascii("JFIF") ++
      Array.fill[Byte](10)(0) // APP0 payload (length includes the 2 len bytes)
    val sof0 = bytes(0xff, 0xc0) ++ be16(17) ++ bytes(8) ++
      be16(480) ++ be16(640) ++ bytes(3) ++ Array.fill[Byte](9)(0)
    val jpeg = bytes(0xff, 0xd8) ++ app0 ++ sof0 ++ bytes(0xff, 0xd9)
    assert(MultimodalOps.sniffDecode(jpeg) === Some(("jpeg", 640, 480, 1)))
  }

  test("JPEG: progressive SOF2 is found too") {
    val sof2 = bytes(0xff, 0xc2) ++ be16(11) ++ bytes(8) ++
      be16(32) ++ be16(48) ++ bytes(1) ++ Array.fill[Byte](3)(0)
    val jpeg = bytes(0xff, 0xd8) ++ sof2
    assert(MultimodalOps.sniffDecode(jpeg) === Some(("jpeg", 48, 32, 1)))
  }

  test("GIF: screen descriptor dims + image-descriptor frame count") {
    def imageDescriptor(w: Int, h: Int) =
      bytes(0x2c) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
        bytes(0x00) ++ // no local palette
        bytes(2) ++ // LZW min code size
        bytes(1, 0x55) ++ // one 1-byte data sub-block
        bytes(0) // block terminator
    val gif = ascii("GIF89a") ++ le16(320) ++ le16(240) ++
      bytes(0x00, 0, 0) ++ // no global palette
      imageDescriptor(320, 240) ++ imageDescriptor(320, 240) ++ bytes(0x3b)
    assert(MultimodalOps.sniffDecode(gif) === Some(("gif", 320, 240, 2)))
  }

  test("BMP: BITMAPINFOHEADER dims; negative (top-down) height normalized") {
    val bmp = ascii("BM") ++ le32(126) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(800) ++ le32(-600) ++ le16(1) ++ le16(24)
    assert(MultimodalOps.sniffDecode(bmp) === Some(("bmp", 800, 600, 1)))
  }

  test("PPM: ASCII header with a comment line") {
    val ppm = ascii("P6\n# made by hand\n640 480\n255\n") ++ Array.fill[Byte](9)(0x7f)
    assert(MultimodalOps.sniffDecode(ppm) === Some(("ppm", 640, 480, 1)))
  }

  test("WAV: fmt chunk (rate, channels) + data chunk sample frames") {
    val nFrames = 44100 // one second, stereo 16-bit
    val blockAlign = 4
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * blockAlign) ++ le16(blockAlign) ++ le16(16)
    val dataSize = nFrames * blockAlign
    val data = ascii("data") ++ le32(dataSize) ++ Array.fill[Byte](dataSize)(0)
    val wav = ascii("RIFF") ++ le32(36 + dataSize) ++ ascii("WAVE") ++ fmt ++ data
    // width/height carry (sampleRate, channels) for audio
    assert(MultimodalOps.sniffDecode(wav) === Some(("wav", 44100, 2, nFrames)))
  }

  test("unknown bytes fall back to the labeled stub (never a throw)") {
    assert(MultimodalOps.sniffDecode(ascii("just some text")) === None)
    assert(MultimodalOps.sniffDecode(Array.emptyByteArray) === None)
    val f = MultimodalOps.decodeRow(MediaRow(7L, "image", ascii("not media")))
    assert(f.format === "unknown" && f.doc_id === 7L)
  }

  test("JPEG: fill bytes (repeated 0xFF) before markers are skipped") {
    // the standard permits any number of 0xFF padding bytes before a
    // marker id; a naive walk misreads them as a segment and derails
    val sof0 = bytes(0xff, 0xff, 0xff, 0xc0) ++ be16(17) ++ bytes(8) ++
      be16(480) ++ be16(640) ++ bytes(3) ++ Array.fill[Byte](9)(0)
    val jpeg = bytes(0xff, 0xd8) ++ sof0
    assert(MultimodalOps.sniffDecode(jpeg) === Some(("jpeg", 640, 480, 1)))
  }

  test("WAV: corrupt chunk sizes terminate the walk instead of looping/crashing") {
    // a negative size once gave a zero/negative step = infinite loop in a
    // Spark task; an overflowing one indexed out of bounds
    val negSize = ascii("RIFF") ++ le32(36) ++ ascii("WAVE") ++
      ascii("junk") ++ le32(-8) ++ Array.fill[Byte](24)(0)
    val r1 = MultimodalOps.sniffDecode(negSize) // must return, not hang
    assert(r1.exists(_._1 == "wav"))
    val hugeSize = ascii("RIFF") ++ le32(36) ++ ascii("WAVE") ++
      ascii("junk") ++ le32(0x7ffffff0) ++ Array.fill[Byte](24)(0)
    assert(MultimodalOps.sniffDecode(hugeSize).exists(_._1 == "wav"))
  }

  test("truncated headers do not crash the decoder") {
    // every real-format magic, cut off mid-header
    val cases = Seq(
      bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0, 0),
      bytes(0xff, 0xd8, 0xff),
      ascii("GIF89a") ++ le16(9),
      ascii("BM") ++ le32(10),
      ascii("P6 12"),
      ascii("RIFF") ++ le32(4) ++ ascii("WAVE"))
    cases.foreach { c =>
      // must terminate and return SOMETHING (recognized-with-defaults or
      // None), never throw
      MultimodalOps.decodeRow(MediaRow(1L, "image", c))
    }
  }
}
