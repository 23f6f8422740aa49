package graft.operators

/** Real DEFLATE/zlib codec (RFC 1950/1951) — the entropy-coded boundary
  * the m-family's P6/WAV/AVI codecs lacked.
  *
  * Decoder: a complete inflater — zlib header check, stored blocks
  * (LEN/NLEN integrity), fixed-Huffman blocks, dynamic-Huffman blocks
  * (code-length alphabet with 16/17/18 repeats, canonical code
  * reconstruction), LZ77 length/distance matches with overlapping copy,
  * and Adler-32 trailer verification. It round-trips streams produced by
  * `java.util.zip.Deflater` at every level/strategy (DeflateCodecSpec),
  * so it is interoperable, not merely self-consistent.
  *
  * Encoder: the deterministic framing for the m11 gate (the m02 recipe —
  * a pure function of the content bytes, so the DuckDB oracle can replay
  * every DECODED value without a compressor of its own): a stored block
  * carrying the first ≤16 bytes, then a fixed-Huffman block with the
  * remaining literals plus ONE length/distance match copying
  * `3 + (b₀ mod 8)` bytes from distance `min(n, 32768)` (overlap-legal),
  * then end-of-block; Adler-32 over the decoded output as the trailer.
  * Decoded output = content ++ extra, where extra[j] =
  * content[n − D + (j mod D)] — byte math DuckDB reproduces exactly.
  *
  * Reference scope note: qubole/rubix caches opaque bytes and never
  * decodes payloads (README.md:1-20); codecs are part of this engine's
  * beyond-reference multimodal tier.
  */
object DeflateCodec {

  // ---- RFC 1951 §3.2.5 tables ----
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  def adler32(data: Array[Byte], len: Int): Long = {
    var a = 1L; var b = 0L
    var i = 0
    while (i < len) {
      a += (data(i) & 0xff); if (a >= 65521L) a -= 65521L
      b += a; b %= 65521L
      i += 1
    }
    (b << 16) | a
  }

  // ---------------------------------------------------------------- bits
  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // byte position
    private var bitBuf = 0
    private var bitCnt = 0
    def readBit(): Int = {
      if (bitCnt == 0) {
        require(pos < data.length, "deflate: truncated bitstream")
        bitBuf = data(pos) & 0xff; pos += 1; bitCnt = 8
      }
      val b = bitBuf & 1
      bitBuf >>= 1; bitCnt -= 1
      b
    }
    /** n bits LSB-first (RFC 1951 packing for integer fields). */
    def readBits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    def alignByte(): Unit = { bitBuf = 0; bitCnt = 0 }
    def readByte(): Int = {
      require(pos < data.length, "deflate: truncated stored block")
      val v = data(pos) & 0xff; pos += 1; v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var bitBuf = 0
    private var bitCnt = 0
    def writeBit(b: Int): Unit = {
      bitBuf |= (b & 1) << bitCnt
      bitCnt += 1
      if (bitCnt == 8) { out.write(bitBuf); bitBuf = 0; bitCnt = 0 }
    }
    /** n bits LSB-first (integer fields / extra bits). */
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** Huffman code: the code's bits MSB-first (RFC 1951 §3.1.1). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def alignByte(): Unit = while (bitCnt != 0) writeBit(0)
    def writeByte(v: Int): Unit = { require(bitCnt == 0); out.write(v) }
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ------------------------------------------------------------- huffman
  /** Canonical Huffman decoder built from a code-length array
    * (RFC 1951 §3.2.2). Bit-at-a-time decode: accumulate the code
    * MSB-first, emit as soon as it lands in a populated length row. */
  private final class Huffman(lengths: Array[Int]) {
    // all-zero lengths are legal (e.g. HDIST=1 with one zero-length code
    // in a literal-only dynamic block): the table exists but any decode
    // attempt is the error, not construction
    private val maxLen = math.max(lengths.max, 1)
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    private val firstCode = new Array[Int](maxLen + 1)
    private val firstSym = new Array[Int](maxLen + 1)
    // symbols sorted by (length, symbol) — canonical order
    private val syms = new Array[Int](count.sum)
    locally {
      var code = 0
      var idx = 0
      for (l <- 1 to maxLen) {
        firstCode(l) = code
        firstSym(l) = idx
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == l) { syms(idx) = s; idx += 1 }
          s += 1
        }
        code = (code + count(l)) << 1
      }
      // Over-subscribed code (Kraft sum > 1) — zlib rejects these too;
      // without the guard decode() could resolve a code to a phantom row.
      var kraft = 0L
      for (l <- 1 to maxLen) kraft += count(l).toLong << (maxLen - l)
      require(kraft <= (1L << maxLen),
        "deflate: over-subscribed huffman code")
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.readBit()
        len += 1
        if (count(len) > 0 && code >= firstCode(len) &&
          code < firstCode(len) + count(len))
          return syms(firstSym(len) + code - firstCode(len))
      }
      throw new IllegalArgumentException("deflate: invalid huffman code")
    }
  }

  private def fixedLitLengths: Array[Int] = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    l
  }
  private def fixedDistLengths: Array[Int] = Array.fill(30)(5)

  // ------------------------------------------------------------- inflate
  /** Full zlib/DEFLATE decode with Adler-32 verification. Throws on any
    * malformed input — a codec, not a heuristic. */
  def inflate(stream: Array[Byte]): Array[Byte] = {
    require(stream.length >= 6, "zlib: stream too short")
    val cmf = stream(0) & 0xff
    val flg = stream(1) & 0xff
    require((cmf & 0x0f) == 8, s"zlib: unsupported method ${cmf & 0x0f}")
    require((cmf * 256 + flg) % 31 == 0, "zlib: bad header check")
    require((flg & 0x20) == 0, "zlib: preset dictionary unsupported")
    val br = new BitReader(java.util.Arrays.copyOfRange(stream, 2, stream.length - 4))
    val out = new java.io.ByteArrayOutputStream()
    val window = new scala.collection.mutable.ArrayBuffer[Byte]()
    def emit(b: Byte): Unit = { out.write(b); window += b }
    var fin = false
    while (!fin) {
      fin = br.readBits(1) == 1
      br.readBits(2) match {
        case 0 => // stored
          br.alignByte()
          val len = br.readByte() | (br.readByte() << 8)
          val nlen = br.readByte() | (br.readByte() << 8)
          require((len ^ 0xffff) == nlen, "deflate: stored LEN/NLEN mismatch")
          var i = 0
          while (i < len) { emit(br.readByte().toByte); i += 1 }
        case btype @ (1 | 2) =>
          val (lit, dist) =
            if (btype == 1) (new Huffman(fixedLitLengths), new Huffman(fixedDistLengths))
            else {
              val hlit = br.readBits(5) + 257
              val hdist = br.readBits(5) + 1
              val hclen = br.readBits(4) + 4
              val clLens = new Array[Int](19)
              var i = 0
              while (i < hclen) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
              val clTab = new Huffman(clLens)
              val lens = new Array[Int](hlit + hdist)
              var n = 0
              while (n < lens.length) {
                clTab.decode(br) match {
                  case 16 =>
                    require(n > 0, "deflate: repeat with no previous length")
                    val rep = 3 + br.readBits(2)
                    require(n + rep <= lens.length,
                      "deflate: code-length repeat overflow")
                    var j = 0
                    while (j < rep) { lens(n) = lens(n - 1); n += 1; j += 1 }
                  case 17 =>
                    val rep = 3 + br.readBits(3)
                    require(n + rep <= lens.length,
                      "deflate: code-length repeat overflow")
                    n += rep
                  case 18 =>
                    val rep = 11 + br.readBits(7)
                    require(n + rep <= lens.length,
                      "deflate: code-length repeat overflow")
                    n += rep
                  case v =>
                    lens(n) = v; n += 1
                }
              }
              require(n == lens.length, "deflate: code-length overflow")
              (new Huffman(lens.take(hlit)), new Huffman(lens.drop(hlit)))
            }
          var eob = false
          while (!eob) {
            val sym = lit.decode(br)
            if (sym < 256) emit(sym.toByte)
            else if (sym == 256) eob = true
            else {
              require(sym <= 285, s"deflate: bad length symbol $sym")
              val li = sym - 257
              val len = LenBase(li) + br.readBits(LenExtra(li))
              val ds = dist.decode(br)
              require(ds < 30, s"deflate: bad distance symbol $ds")
              val d = DistBase(ds) + br.readBits(DistExtra(ds))
              require(d <= window.length, "deflate: distance beyond window")
              var j = 0
              while (j < len) { // overlapping copy is byte-sequential
                emit(window(window.length - d))
                j += 1
              }
            }
          }
        case t => throw new IllegalArgumentException(s"deflate: BTYPE $t")
      }
    }
    val decoded = out.toByteArray
    val tr = stream.length - 4
    val expect = ((stream(tr) & 0xffL) << 24) | ((stream(tr + 1) & 0xffL) << 16) |
      ((stream(tr + 2) & 0xffL) << 8) | (stream(tr + 3) & 0xffL)
    val got = adler32(decoded, decoded.length)
    require(got == expect,
      f"zlib: adler mismatch (got $got%08x want $expect%08x)")
    decoded
  }

  // ------------------------------------------------- deterministic frame
  /** Extra-copy length of the framing's single match: 3 + (b₀ mod 8),
    * zero for empty content. */
  def extraLen(content: Array[Byte]): Int =
    if (content.isEmpty) 0 else 3 + (content(0) & 0x07)

  /** Match distance: the window is the whole content, capped at the
    * 32 KiB DEFLATE limit. */
  def matchDist(n: Int): Int = math.min(n, 32768)

  /** The decoded output the framing's stream inflates to:
    * content ++ extra, extra[j] = content[n − D + (j mod D)]. */
  def decodedOf(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    if (n == 0) return content
    val l = extraLen(content)
    val d = matchDist(n)
    val out = new Array[Byte](n + l)
    System.arraycopy(content, 0, out, 0, n)
    var j = 0
    while (j < l) { out(n + j) = content(n - d + (j % d)); j += 1 }
    out
  }

  /** Deterministic zlib framing (see object scaladoc): stored block with
    * the first ≤16 bytes, fixed-Huffman block with the rest + one match,
    * Adler-32 over [[decodedOf]] as the trailer. */
  def deflateFrame(content: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter()
    bw.writeByte(0x78); bw.writeByte(0x01) // CMF/FLG, (0x7801 % 31 == 0)
    val n = content.length
    if (n == 0) {
      // single empty stored block
      bw.writeBits(1, 1); bw.writeBits(0, 2); bw.alignByte()
      bw.writeByte(0); bw.writeByte(0); bw.writeByte(0xff); bw.writeByte(0xff)
    } else {
      val s = math.min(n, 16)
      // stored block, BFINAL=0
      bw.writeBits(0, 1); bw.writeBits(0, 2); bw.alignByte()
      bw.writeByte(s & 0xff); bw.writeByte((s >> 8) & 0xff)
      bw.writeByte(~s & 0xff); bw.writeByte((~s >> 8) & 0xff)
      var i = 0
      while (i < s) { bw.writeByte(content(i) & 0xff); i += 1 }
      // fixed-Huffman block, BFINAL=1
      bw.writeBits(1, 1); bw.writeBits(1, 2)
      def lit(v: Int): Unit =
        if (v < 144) bw.writeCode(0x30 + v, 8)
        else bw.writeCode(0x190 + (v - 144), 9)
      while (i < n) { lit(content(i) & 0xff); i += 1 }
      // one match: length 3..10 (symbols 257..264, no extra bits)
      val l = extraLen(content)
      val d = matchDist(n)
      // 7-bit fixed codes are (symbol − 256) for symbols 256..279; the
      // length symbol is 257 + (l − 3), so its code is l − 2
      bw.writeCode(l - 2, 7)
      val ds = DistBase.lastIndexWhere(_ <= d)
      bw.writeCode(ds, 5)
      bw.writeBits(d - DistBase(ds), DistExtra(ds))
      bw.writeCode(0, 7) // end of block (symbol 256)
      bw.alignByte()
    }
    val body = bw.toBytes
    val ad = adler32(decodedOf(content), decodedOf(content).length)
    val out = new Array[Byte](body.length + 4)
    System.arraycopy(body, 0, out, 0, body.length)
    out(body.length) = ((ad >> 24) & 0xff).toByte
    out(body.length + 1) = ((ad >> 16) & 0xff).toByte
    out(body.length + 2) = ((ad >> 8) & 0xff).toByte
    out(body.length + 3) = (ad & 0xff).toByte
    out
  }

  /** Exact-content zlib framing for container codecs (PNG IDAT, m12):
    * the [[deflateFrame]] layout minus the match — stored block with the
    * first ≤16 bytes, fixed-Huffman literals for the rest, end-of-block
    * — so the stream inflates to exactly `content`. */
  def deflateLiteralFrame(content: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter()
    bw.writeByte(0x78); bw.writeByte(0x01)
    val n = content.length
    if (n == 0) {
      bw.writeBits(1, 1); bw.writeBits(0, 2); bw.alignByte()
      bw.writeByte(0); bw.writeByte(0); bw.writeByte(0xff); bw.writeByte(0xff)
    } else {
      val s = math.min(n, 16)
      bw.writeBits(0, 1); bw.writeBits(0, 2); bw.alignByte()
      bw.writeByte(s & 0xff); bw.writeByte((s >> 8) & 0xff)
      bw.writeByte(~s & 0xff); bw.writeByte((~s >> 8) & 0xff)
      var i = 0
      while (i < s) { bw.writeByte(content(i) & 0xff); i += 1 }
      bw.writeBits(1, 1); bw.writeBits(1, 2)
      def lit(v: Int): Unit =
        if (v < 144) bw.writeCode(0x30 + v, 8)
        else bw.writeCode(0x190 + (v - 144), 9)
      while (i < n) { lit(content(i) & 0xff); i += 1 }
      bw.writeCode(0, 7) // end of block
      bw.alignByte()
    }
    val body = bw.toBytes
    val ad = adler32(content, n)
    val out = new Array[Byte](body.length + 4)
    System.arraycopy(body, 0, out, 0, body.length)
    out(body.length) = ((ad >> 24) & 0xff).toByte
    out(body.length + 1) = ((ad >> 16) & 0xff).toByte
    out(body.length + 2) = ((ad >> 8) & 0xff).toByte
    out(body.length + 3) = (ad & 0xff).toByte
    out
  }
}
