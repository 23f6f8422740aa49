package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The RIFF/WAVE codec behind m06/m07: encode/decode roundtrip, genuine
  * chunk walking (junk chunks, word-alignment padding), and malformed-
  * input rejection. Pure JVM — no Spark session. */
class WavCodecSpec extends AnyFunSuite {

  private def sample(content: Array[Byte], k: Int): Short = {
    val n = content.length
    val lo = if (n == 0) 0 else content((2 * k) % n) & 0xff
    val hiRaw = if (n == 0) 0 else content((2 * k + 1) % n) & 0xff
    val hi = hiRaw ^ (if (k % 2 == 0) 0x80 else 0)
    ((lo | (hi << 8)).toShort)
  }

  test("roundtrip reproduces the framing rule exactly") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val content = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val wav = WavCodec.decodeWav(WavCodec.makeWav(content))
      val ns = 32 + (if (content.isEmpty) 0 else content(0) & 0x3f)
      assert(wav.sampleRate == 8000 && wav.bitsPerSample == 16 && wav.channels == 1)
      assert(wav.samples.length == ns)
      wav.samples.zipWithIndex.foreach { case (s, k) =>
        assert(s == sample(content, k), s"sample $k")
      }
    }
  }

  test("payload length matches the documented 56 + 2*ns layout") {
    val content = "hello wav".getBytes("UTF-8")
    val bytes = WavCodec.makeWav(content)
    assert(bytes.length == 56 + 2 * (32 + (content(0) & 0x3f)))
  }

  test("parser walks unknown chunks incl. RIFF odd-size pad byte") {
    // hand-build: RIFF [fmt ] [junk size=3 + pad] [data 2 samples]
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); le32(4 + 24 + (8 + 3 + 1) + (8 + 4)); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
    ascii("junk"); le32(3); out.write(1); out.write(2); out.write(3); out.write(0) // odd size => pad
    ascii("data"); le32(4); le16(0x1234); le16(0x8001)
    val wav = WavCodec.decodeWav(out.toByteArray)
    assert(wav.samples.toSeq == Seq(0x1234.toShort, 0x8001.toShort))
    assert(wav.samples(1) < 0, "0x8001 must decode signed")
  }

  test("malformed inputs are rejected, not guessed at") {
    val good = WavCodec.makeWav("content".getBytes)
    // bad magic
    val m = good.clone(); m(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavCodec.decodeWav(m))
    // RIFF size lies about the payload
    val sz = good.clone(); sz(4) = (sz(4) + 1).toByte
    assertThrows[IllegalArgumentException](WavCodec.decodeWav(sz))
    // truncated mid-data
    assertThrows[IllegalArgumentException](
      WavCodec.decodeWav(java.util.Arrays.copyOfRange(good, 0, good.length - 1)))
    // data before fmt
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    ascii("RIFF"); le32(4 + 8 + 2); ascii("WAVE"); ascii("data"); le32(2); out.write(0); out.write(0)
    assertThrows[IllegalArgumentException](WavCodec.decodeWav(out.toByteArray))
  }
}
