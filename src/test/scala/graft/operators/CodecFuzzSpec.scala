package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input robustness for the whole codec tier — the
  * DeflateCodec lesson (r11 ADVICE: a code-length repeat could escape as
  * ArrayIndexOutOfBounds instead of the documented IllegalArgument)
  * applied to its siblings. A 100 TB ingest WILL contain corrupt bytes;
  * the contract is that every parser REJECTS them with
  * IllegalArgumentException (the m10 router's parsed_ok path catches
  * exactly that), never an unclassified runtime error that would fail
  * the whole task instead of flagging the row.
  *
  * Three corruption families per codec: pure random bytes, random bytes
  * behind a valid magic (exercises header/chunk parsing), and bit-flip /
  * truncation mutations of VALID frames (exercises deep structure —
  * declared sizes, chunk walks, sample math).
  */
class CodecFuzzSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(271828)

  /** Run one decode attempt; only success or IllegalArgumentException may
    * come out. Returns true when the input was (perhaps surprisingly)
    * accepted — callers count these for the mutation families. */
  private def attempt(what: String, body: => Any): Boolean =
    try { body; true }
    catch {
      case _: IllegalArgumentException => false
      case e: Throwable =>
        fail(s"$what escaped with ${e.getClass.getName}: ${e.getMessage}")
    }

  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  test("random garbage never escapes any codec as a non-IllegalArgument error") {
    for (_ <- 1 to 1500) {
      val b = randomBytes(rnd.nextInt(200))
      attempt("decodeWav", WavCodec.decodeWav(b))
      attempt("decodeAvi", AviCodec.decodeAvi(b))
      attempt("decodePpm", MultimodalQueries.decodePpm(b))
      attempt("decodePng", PngCodec.decodePng(b))
    }
  }

  test("garbage behind a valid magic still rejects cleanly") {
    for (_ <- 1 to 1500) {
      val tail = randomBytes(12 + rnd.nextInt(150))
      attempt("wav-magic",
        WavCodec.decodeWav("RIFF".getBytes ++ tail))
      attempt("wave-magic",
        WavCodec.decodeWav("RIFF".getBytes ++ randomBytes(4) ++
          "WAVE".getBytes ++ tail))
      attempt("avi-magic",
        AviCodec.decodeAvi("RIFF".getBytes ++ randomBytes(4) ++
          "AVI ".getBytes ++ tail))
      attempt("ppm-magic",
        MultimodalQueries.decodePpm("P6".getBytes ++ tail))
      attempt("png-magic", PngCodec.decodePng(
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
          .map(_.toByte) ++ tail))
    }
  }

  test("bit-flips and truncations of valid frames reject or decode, never crash") {
    val content = randomBytes(96)
    val frames = Seq[(String, Array[Byte], Array[Byte] => Any)](
      ("wav", WavCodec.makeWav(content), b => WavCodec.decodeWav(b)),
      ("avi", AviCodec.makeAvi(content), b => AviCodec.decodeAvi(b)),
      ("ppm", MultimodalQueries.makePpm(content),
        b => MultimodalQueries.decodePpm(b)),
      ("png", PngCodec.encodePng(8, 8,
        Array.tabulate(64)(i => content(i % content.length) & 0xff)),
        b => PngCodec.decodePng(b)))
    for ((name, frame, decode) <- frames) {
      // sanity: the unmutated frame decodes
      assert(attempt(s"$name-clean", decode(frame)))
      for (trial <- 1 to 800) {
        val m = frame.clone()
        rnd.nextInt(3) match {
          case 0 => // single random bit flip
            val i = rnd.nextInt(m.length)
            m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
            attempt(s"$name-bitflip@$i", decode(m))
          case 1 => // truncation
            attempt(s"$name-trunc", decode(m.take(rnd.nextInt(m.length))))
          case 2 => // splice a random run
            val at = rnd.nextInt(m.length)
            val run = math.min(1 + rnd.nextInt(8), m.length - at)
            val junk = randomBytes(run)
            System.arraycopy(junk, 0, m, at, run)
            attempt(s"$name-splice@$at", decode(m))
        }
      }
    }
  }
}
