package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The RIFF/AVI-style container codec behind m08: demux roundtrip,
  * header/frame consistency validation, malformed-input rejection.
  * Pure JVM — no Spark session. */
class AviCodecSpec extends AnyFunSuite {

  private val content = "the quick brown fox jumps over the lazy dog".getBytes

  test("demux roundtrip reproduces the framing rule") {
    val rnd = new scala.util.Random(11)
    (0 until 30).foreach { _ =>
      val c = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      val v = AviCodec.decodeAvi(AviCodec.makeAvi(c))
      val n = c.length
      val w = 4 + (if (n == 0) 0 else c(0) & 7)
      val h = 4 + (if (n < 2) 0 else c(1) & 7)
      val nf = 2 + (if (n < 3) 0 else c(2) & 3)
      assert(v.declaredFrames == nf && v.frames.length == nf)
      assert(v.width == w && v.height == h)
      v.frames.foreach { fr =>
        assert(fr.image.width == w && fr.image.height == h)
        fr.image.pixels.zipWithIndex.foreach { case (p, j) =>
          val want = if (n == 0) 0.toByte else c((j + fr.idx) % n)
          assert(p == want, s"frame ${fr.idx} pixel $j")
        }
      }
    }
  }

  test("avih/frame-count mismatch is rejected") {
    val avi = AviCodec.makeAvi(content)
    // bump the declared frame count in avih (offset: 12 RIFF + 8 LIST hdr
    // + 4 'hdrl' + 8 avih hdr = 32)
    val bad = avi.clone(); bad(32) = (bad(32) + 1).toByte
    assertThrows[IllegalArgumentException](AviCodec.decodeAvi(bad))
  }

  test("lying RIFF size and bad magic are rejected") {
    val avi = AviCodec.makeAvi(content)
    val sz = avi.clone(); sz(4) = (sz(4) + 1).toByte
    assertThrows[IllegalArgumentException](AviCodec.decodeAvi(sz))
    val magic = avi.clone(); magic(9) = 'X'.toByte
    assertThrows[IllegalArgumentException](AviCodec.decodeAvi(magic))
  }

  test("a corrupted embedded frame fails the P6 parse, not silently") {
    val avi = AviCodec.makeAvi(content)
    // first frame payload starts after: 12 + 36 (hdrl) + 12 (movi LIST
    // hdr+tag) + 8 (00db hdr) = 68; break the P6 magic
    val bad = avi.clone(); bad(68) = 'X'.toByte
    assertThrows[IllegalArgumentException](AviCodec.decodeAvi(bad))
  }
}
