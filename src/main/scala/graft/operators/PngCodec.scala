package graft.operators

/** Real PNG codec (RFC 2083 subset: 8-bit grayscale, no interlace) on
  * top of the m11 inflater — the container tier above the entropy-coded
  * boundary: chunk framing with per-chunk CRC-32, zlib-wrapped IDAT
  * (`DeflateCodec`), and the full five-type scanline filter
  * reconstruction (None/Sub/Up/Average/Paeth).
  *
  * Decoder: signature check, chunk walk with CRC-32 verification on
  * EVERY chunk, multi-IDAT concatenation, ancillary-chunk skip, IHDR
  * validation, inflate, scanline-volume check, and filter
  * reconstruction. Malformed input (bad signature, truncated chunk, CRC
  * mismatch, bad IHDR, bad filter type, wrong scanline volume, or any
  * inflate-level corruption) rejects with IllegalArgumentException —
  * the codec-tier contract CodecFuzzSpec enforces. Interoperability is
  * proven against `javax.imageio`'s independent PNG reader in-band in
  * the m12 gate and in PngCodecSpec, so the codec is interoperable, not
  * merely self-consistent.
  *
  * Encoder: deterministic fixture builder for the gate — filter type
  * `row % 5` (every filter exercised on any image with ≥ 5 rows), IDAT
  * via [[DeflateCodec.deflateLiteralFrame]] so the filtered scanlines
  * survive framing exactly.
  *
  * Reference scope note: qubole/rubix caches opaque bytes and never
  * decodes payloads (README.md:1-20); codecs are part of this engine's
  * beyond-reference multimodal tier.
  */
object PngCodec {

  final case class PngImage(width: Int, height: Int, pixels: Array[Int])

  private val Sig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c; n += 1
    }
    t
  }

  /** Table-driven CRC-32 (ISO 3309, the PNG chunk checksum). */
  def crc32(data: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xffffffff
    var i = off
    while (i < off + len) {
      c = crcTable((c ^ data(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xffffffffL
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Assemble a PNG container from already-filtered scanlines — the
    * shared encoder tail, and the hook PngCodecSpec uses to craft
    * adversarial fixtures (bad filter types, wrong scanline volume)
    * that a well-formed encoder could never emit. */
  private[operators] def rawPng(w: Int, h: Int,
      filt: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val buf = new Array[Byte](4 + len)
      System.arraycopy(typ.getBytes("US-ASCII"), 0, buf, 0, 4)
      System.arraycopy(data, 0, buf, 4, len)
      out.write(buf, 0, buf.length)
      val crc = crc32(buf, 0, buf.length)
      out.write(((crc >>> 24) & 0xff).toInt); out.write(((crc >>> 16) & 0xff).toInt)
      out.write(((crc >>> 8) & 0xff).toInt); out.write((crc & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // compression 0, filter method 0, interlace 0 already zeroed
    chunk("IHDR", ihdr)
    chunk("IDAT", DeflateCodec.deflateLiteralFrame(filt))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode grayscale pixels (row-major, 0-255) with filter type
    * `row % 5`. */
  def encodePng(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && pixels.length == w * h, "bad dimensions")
    val filt = new Array[Byte](h * (w + 1))
    var r = 0
    while (r < h) {
      val t = r % 5
      filt(r * (w + 1)) = t.toByte
      var c = 0
      while (c < w) {
        val x = pixels(r * w + c)
        val a = if (c > 0) pixels(r * w + c - 1) else 0
        val b = if (r > 0) pixels((r - 1) * w + c) else 0
        val d = if (r > 0 && c > 0) pixels((r - 1) * w + c - 1) else 0
        val v = t match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case _ => x - paeth(a, b, d)
        }
        filt(r * (w + 1) + 1 + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    rawPng(w, h, filt)
  }

  /** The REAL decode: chunk walk + CRC verify + inflate + filter
    * reconstruction. Throws IllegalArgumentException on any
    * malformation. */
  def decodePng(png: Array[Byte]): PngImage = {
    require(png.length >= 8 &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(png, 0, 8), Sig),
      "bad PNG signature")
    def u32(o: Int): Long =
      ((png(o) & 0xff).toLong << 24) | ((png(o + 1) & 0xff) << 16) |
        ((png(o + 2) & 0xff) << 8) | (png(o + 3) & 0xff)
    var pos = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(pos + 8 <= png.length, "truncated chunk header")
      val len = u32(pos).toInt
      require(len >= 0 && pos.toLong + 12 + len <= png.length,
        "truncated chunk")
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      require(u32(pos + 8 + len) == crc32(png, pos + 4, 4 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          val wl = u32(pos + 8); val hl = u32(pos + 12)
          // Bound each dimension BEFORE the product: a 2^31..2^32-1
          // dimension would wrap negative in Int arithmetic, and with
          // both near 2^31 even the Long product hl*(wl+1) wraps.
          require(wl > 0 && hl > 0 &&
            wl <= Int.MaxValue && hl <= Int.MaxValue &&
            hl * (wl + 1L) <= Int.MaxValue,
            "bad dimensions")
          w = wl.toInt; h = hl.toInt
          require((png(pos + 16) & 0xff) == 8 && (png(pos + 17) & 0xff) == 0,
            "only 8-bit grayscale supported")
          require((png(pos + 18) & 0xff) == 0 && (png(pos + 19) & 0xff) == 0 &&
            (png(pos + 20) & 0xff) == 0, "bad IHDR method/interlace")
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => require(len == 0, "bad IEND"); ended = true
        case _      => () // ancillary chunk: CRC-checked, then skipped
      }
      pos += 12 + len
    }
    require(w > 0, "missing IHDR")
    val filt = DeflateCodec.inflate(idat.toByteArray)
    require(filt.length == h * (w + 1), "wrong scanline volume")
    val px = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val t = filt(r * (w + 1)) & 0xff
      require(t <= 4, s"bad filter type $t")
      var c = 0
      while (c < w) {
        val x = filt(r * (w + 1) + 1 + c) & 0xff
        val a = if (c > 0) px(r * w + c - 1) else 0
        val b = if (r > 0) px((r - 1) * w + c) else 0
        val d = if (r > 0 && c > 0) px((r - 1) * w + c - 1) else 0
        val v = t match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case _ => x + paeth(a, b, d)
        }
        px(r * w + c) = v & 0xff
        c += 1
      }
      r += 1
    }
    PngImage(w, h, px)
  }
}
