package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** DeflateCodec is a real, interoperable inflater — proven both ways:
  * (1) it inflates streams produced by `java.util.zip.Deflater` at every
  * compression level (level 0 emits stored blocks, 1 favors fixed/short
  * dynamic, 9 emits dynamic-Huffman with deep matches), and
  * (2) `java.util.zip.Inflater` decodes the deterministic m11 framing to
  * exactly [[DeflateCodec.decodedOf]]. Plus malformed-input rejection. */
class DeflateCodecSpec extends AnyFunSuite {

  private def javaDeflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def javaInflate(stream: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(stream)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "java inflater stalled")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private val rnd = new scala.util.Random(42)
  private val corpora: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](7),
    "ascii" -> ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8"),
    "repetitive" -> Array.fill(10000)("abcd".getBytes("UTF-8")).flatten.toArray,
    "random4k" -> Array.fill(4096)(rnd.nextInt().toByte),
    "allbytes" -> Array.tabulate(2048)(i => i.toByte),
    "long" -> Array.fill(100000)((rnd.nextInt(8) + 'a').toByte))

  test("inflates java.util.zip.Deflater output at levels 0/1/6/9 (stored+fixed+dynamic)") {
    for ((name, data) <- corpora; level <- Seq(0, 1, 6, 9)) {
      val got = DeflateCodec.inflate(javaDeflate(data, level))
      assert(java.util.Arrays.equals(got, data), s"$name at level $level")
    }
  }

  test("java.util.zip.Inflater decodes the m11 framing to decodedOf") {
    for ((name, data) <- corpora) {
      val frame = DeflateCodec.deflateFrame(data)
      val expect = DeflateCodec.decodedOf(data)
      assert(java.util.Arrays.equals(javaInflate(frame), expect),
        s"$name: java inflater disagrees with decodedOf")
      assert(java.util.Arrays.equals(DeflateCodec.inflate(frame), expect),
        s"$name: own inflater disagrees with decodedOf")
    }
  }

  test("decodedOf appends 3..10 bytes copied from distance min(n, 32768)") {
    val data = "hello world".getBytes("UTF-8") // b0='h'=104, 104%8=0 -> l=3
    val dec = DeflateCodec.decodedOf(data)
    assert(dec.length == data.length + 3)
    assert(new String(dec, "UTF-8") == "hello worldhel")
  }

  test("malformed input is rejected, not absorbed") {
    val good = DeflateCodec.deflateFrame("payload bytes".getBytes("UTF-8"))
    // corrupted adler trailer
    val badAdler = good.clone(); badAdler(badAdler.length - 1) = (badAdler.last ^ 0x01).toByte
    assertThrows[IllegalArgumentException](DeflateCodec.inflate(badAdler))
    // truncated stream
    assertThrows[IllegalArgumentException](
      DeflateCodec.inflate(good.take(good.length / 2)))
    // bad zlib header check
    val badHdr = good.clone(); badHdr(1) = (badHdr(1) ^ 0x10).toByte
    assertThrows[IllegalArgumentException](DeflateCodec.inflate(badHdr))
    // stored LEN/NLEN mismatch
    val stored = DeflateCodec.deflateFrame(Array.emptyByteArray).clone()
    stored(4) = (stored(4) ^ 0x01).toByte // flip a LEN byte vs its ~NLEN
    assertThrows[IllegalArgumentException](DeflateCodec.inflate(stored))
  }
}
