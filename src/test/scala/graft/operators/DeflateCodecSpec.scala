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

  /** LSB-first bit writer mirroring RFC 1951 framing, for hand-crafting
    * malformed dynamic-Huffman blocks (the codec's own BitWriter is
    * private, and deflateFrame only emits well-formed streams). */
  private final class Bits {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0; private var cnt = 0
    def bit(b: Int): Unit = {
      buf |= (b & 1) << cnt; cnt += 1
      if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
    }
    def bits(v: Int, n: Int): Unit = (0 until n).foreach(i => bit((v >> i) & 1))
    def byte(v: Int): Unit = { while (cnt != 0) bit(0); out.write(v) }
    def toBytes: Array[Byte] = { while (cnt != 0) bit(0); out.toByteArray }
  }

  /** Preamble shared by the crafted blocks: zlib header, BFINAL=1,
    * BTYPE=2 (dynamic), HLIT=257, HDIST=1, HCLEN=4 — so the code-length
    * table covers ClOrder(0..3) = 16,17,18,0. */
  private def dynPreamble(clLen16: Int, clLen17: Int, clLen18: Int,
      clLen0: Int): Bits = {
    val w = new Bits
    w.byte(0x78); w.byte(0x01)
    w.bit(1); w.bits(2, 2)       // BFINAL, BTYPE=2
    w.bits(0, 5); w.bits(0, 5); w.bits(0, 4) // HLIT=257 HDIST=1 HCLEN=4
    w.bits(clLen16, 3); w.bits(clLen17, 3)
    w.bits(clLen18, 3); w.bits(clLen0, 3)
    w
  }

  test("code-length repeat past the table end raises IllegalArgumentException, not AIOOBE") {
    // CL table: {0 -> code 0, 16 -> code 1}, both length 1.
    val w = dynPreamble(clLen16 = 1, clLen17 = 0, clLen18 = 0, clLen0 = 1)
    w.bit(0)                      // sym 0: lens(0)=0, n=1
    // 45 repeats of sym 16 with rep=6 each write past lens.length=258
    (1 to 45).foreach { _ => w.bit(1); w.bits(3, 2) }
    val frame = w.toBytes ++ Array[Byte](0, 0, 0, 0) // adler never reached
    assertThrows[IllegalArgumentException](DeflateCodec.inflate(frame))
  }

  test("over-subscribed huffman table raises IllegalArgumentException") {
    // four length-1 code-length codes: Kraft sum 4 > 2
    val w = dynPreamble(clLen16 = 1, clLen17 = 1, clLen18 = 1, clLen0 = 1)
    val frame = w.toBytes ++ Array[Byte](0, 0, 0, 0)
    assertThrows[IllegalArgumentException](DeflateCodec.inflate(frame))
  }

  test("random garbage after a valid header never escapes as a non-IllegalArgument error") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 2000) {
      val body = new Array[Byte](6 + rnd.nextInt(64))
      rnd.nextBytes(body)
      val frame = Array[Byte](0x78, 0x01) ++ body
      try { DeflateCodec.inflate(frame); () }
      catch {
        case _: IllegalArgumentException => () // the documented rejection
        case e: Throwable =>
          fail(s"trial $trial: escaped ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
