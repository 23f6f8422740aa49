package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec semantics beyond the m12 gate: filter reconstruction
  * round-trips every type, the independent javax.imageio reader agrees
  * pixel-for-pixel (interop, not self-consistency), CRC-32 matches the
  * reference java.util.zip implementation, corruption classes reject
  * with the codec-tier contract exception, and the chunk walk skips
  * (but still CRC-checks) ancillary chunks. */
class PngCodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(314159)

  private def randomPixels(n: Int): Array[Int] =
    Array.fill(n)(rnd.nextInt(256))

  test("decode(encode) round-trips random images, all sizes incl. <5 rows") {
    for (_ <- 1 to 200) {
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val px = randomPixels(w * h)
      val dec = PngCodec.decodePng(PngCodec.encodePng(w, h, px))
      assert(dec.width == w && dec.height == h)
      assert(dec.pixels.sameElements(px), s"pixel mismatch at ${w}x$h")
    }
  }

  test("javax.imageio's independent PNG reader agrees pixel-for-pixel") {
    for (_ <- 1 to 25) {
      val w = 3 + rnd.nextInt(10)
      val h = 5 + rnd.nextInt(8) // >= 5 rows: every filter type present
      val px = randomPixels(w * h)
      val png = PngCodec.encodePng(w, h, px)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      val raster = img.getRaster
      for (r <- 0 until h; c <- 0 until w)
        assert(raster.getSample(c, r, 0) == px(r * w + c),
          s"imageio disagrees at ($r,$c) in ${w}x$h")
    }
  }

  test("crc32 matches java.util.zip.CRC32 on random buffers") {
    for (_ <- 1 to 100) {
      val b = new Array[Byte](1 + rnd.nextInt(300)); rnd.nextBytes(b)
      val ref = new java.util.zip.CRC32()
      ref.update(b)
      assert(PngCodec.crc32(b, 0, b.length) == ref.getValue)
    }
  }

  test("chunk CRC corruption rejects as IllegalArgumentException") {
    val png = PngCodec.encodePng(6, 6, randomPixels(36))
    // corrupt one byte inside the IDAT data region (after sig + IHDR)
    val m = png.clone()
    val idatData = 8 + 25 + 8 // sig, IHDR chunk (12+13), IDAT len+type
    m(idatData + 2) = (m(idatData + 2) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(m))
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("bad filter type and wrong scanline volume reject") {
    val w = 5; val h = 5
    val filt = new Array[Byte](h * (w + 1))
    filt(0) = 7 // filter type a well-formed encoder can never emit
    val badType = intercept[IllegalArgumentException](
      PngCodec.decodePng(PngCodec.rawPng(w, h, filt)))
    assert(badType.getMessage.contains("bad filter type"))
    val short = intercept[IllegalArgumentException](
      PngCodec.decodePng(PngCodec.rawPng(w, h, new Array[Byte](h * w))))
    assert(short.getMessage.contains("wrong scanline volume"))
  }

  test("overflowing dimensions reject in Long arithmetic (CRCs valid)") {
    // w=65535, h=65536: h*(w+1) wraps to 0 in Int, so an empty-inflating
    // IDAT would pass the scanline-volume check and then blow up in
    // allocation — the one malformed-input class CodecFuzzSpec can't
    // reach (random mutations never produce valid chunk CRCs)
    val e = intercept[IllegalArgumentException](
      PngCodec.decodePng(PngCodec.rawPng(65535, 65536, Array.emptyByteArray)))
    assert(e.getMessage.contains("bad dimensions"))
  }

  test("ancillary chunks are CRC-checked then skipped") {
    val w = 4; val h = 4
    val px = randomPixels(w * h)
    val png = PngCodec.encodePng(w, h, px)
    // splice a tEXt chunk between IHDR and IDAT
    val ihdrEnd = 8 + 25
    val data = "note".getBytes("US-ASCII")
    val body = new Array[Byte](4 + data.length)
    System.arraycopy("tEXt".getBytes("US-ASCII"), 0, body, 0, 4)
    System.arraycopy(data, 0, body, 4, data.length)
    val crc = PngCodec.crc32(body, 0, body.length)
    val chunk = Array[Byte](0, 0, 0, data.length.toByte) ++ body ++
      Array[Byte]((crc >>> 24).toByte, (crc >>> 16).toByte,
        (crc >>> 8).toByte, crc.toByte)
    val spliced = png.take(ihdrEnd) ++ chunk ++ png.drop(ihdrEnd)
    val dec = PngCodec.decodePng(spliced)
    assert(dec.pixels.sameElements(px))
    // the same chunk with a wrong CRC must reject, not skip silently
    val bad = spliced.clone()
    bad(ihdrEnd + 8) = (bad(ihdrEnd + 8) ^ 1).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decodePng(bad))
    assert(e.getMessage.contains("CRC mismatch"))
  }
}
