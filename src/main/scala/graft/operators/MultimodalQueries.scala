package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batch per partition via mapPartitions (the Scala
  * analog of a Pandas-batch UDF: one iterator per partition, no per-row
  * driver involvement, executes distributed).
  *
  * Since round 9 the image path is a REAL codec for a real format: each
  * document's bytes are framed as a binary NetPBM P6 (PPM) image — a
  * deterministic encode, so DuckDB can reproduce the pixel math — and the
  * decode step is a genuine P6 parser (magic + comment-aware ASCII header
  * + maxval + raw RGB pixel array), not a byte-arithmetic stand-in. The
  * audio path (m06/m07) follows the same recipe with a real RIFF/WAVE
  * PCM codec ([[WavCodec]]). The container still has no compressed
  * (JPEG/MP3/MP4) codecs, so m05's video frame sampling keeps the
  * documented fixed-frame interpretation of the raw payload.
  */
object MultimodalQueries {

  /** A decoded P6 image: `pixels` is the raw interleaved RGB array
    * (width × height × 3 bytes, row-major). */
  final case class PpmImage(width: Int, height: Int, maxval: Int,
      pixels: Array[Byte]) {
    def channels: Int = 3
  }

  /** Deterministic P6 encode of a document's content bytes: dimensions
    * come from the first two bytes (4 + b%8 → 4..11 per side), pixels
    * cycle through the content (`pixel(i) = bytes(i mod n)`; empty docs
    * render black). The framing exists so the DECODER below has a real
    * compressed-format boundary to parse while DuckDB can still
    * recompute every emitted value from the same content bytes. */
  def makePpm(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val w = 4 + (if (n == 0) 0 else content(0) & 0x07)
    val h = 4 + (if (n < 2) 0 else content(1) & 0x07)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    val k = w * h * 3
    while (i < k) {
      out(header.length + i) = if (n == 0) 0 else content(i % n)
      i += 1
    }
    out
  }

  /** REAL P6 parser: magic, whitespace/`#`-comment-tolerant ASCII header
    * (width, height, maxval), single whitespace, then the raw pixel
    * array. Throws on malformed input — a codec, not a heuristic. */
  def decodePpm(payload: Array[Byte]): PpmImage = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 ppm: bad magic")
    var pos = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < payload.length) {
        val c = payload(pos)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else going = false
      }
    }
    def parseInt(): Int = {
      skipSpaceAndComments()
      require(pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9',
        s"ppm header: expected digit at offset $pos")
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0')
        pos += 1
      }
      v
    }
    val width = parseInt()
    val height = parseInt()
    val maxval = parseInt()
    require(maxval > 0 && maxval < 256, s"unsupported ppm maxval $maxval")
    // exactly ONE whitespace byte separates the header from pixel data
    require(pos < payload.length, "ppm truncated before pixel data")
    pos += 1
    val k = width * height * 3
    require(payload.length - pos >= k,
      s"ppm truncated: need $k pixel bytes, have ${payload.length - pos}")
    val pixels = java.util.Arrays.copyOfRange(payload, pos, pos + k)
    PpmImage(width, height, maxval, pixels)
  }

  /** Box-filter downsample to a 2×2 grid: exact per-quadrant pixel sums
    * over all three channels — the accumulation pass of every real
    * resizer, emitted as exact longs so the oracle hash is stable. */
  def resizeSums(img: PpmImage): Array[Long] = {
    val out = new Array[Long](4)
    var y = 0
    while (y < img.height) {
      var x = 0
      val by = y * 2 / img.height
      while (x < img.width) {
        val b = by * 2 + (x * 2 / img.width)
        var c = 0
        val base = (y * img.width + x) * 3
        while (c < 3) { out(b) += (img.pixels(base + c) & 0xff); c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Video-frame interpretation of the raw payload (m05): fixed-size
    * frames, every `frameStride`-th complete frame kept. */
  val frameLen = 64
  val frameStride = 3

  /** Perceptual difference-hash grid (m09): cell sums on a fixed
    * `DhashW` × `DhashH` spatial grid, one bit per horizontally adjacent
    * cell pair → (DhashW-1) × DhashH bits. 5×4 (16 bits) rather than the
    * classic 9×8 because the framed images are 4-11 px per side — a
    * finer grid than the pixel raster adds only empty cells. */
  val DhashW = 5
  val DhashH = 4

  /** Difference hash over a decoded image: integer cell sums (all three
    * channels — the grayscale reduction every dHash starts with, kept as
    * the exact RGB sum so the oracle needs no float luma weights), then
    * bit (r*(DhashW-1)+c) = mean(r,c) > mean(r,c+1). The mean compare is
    * cross-multiplied (`s_a·n_b > s_b·n_a`) so it stays EXACT integer
    * math: the raster rarely divides evenly into the grid, so cells hold
    * unequal byte counts and a raw sum compare would hash a uniform
    * image to a nonzero pattern. Deterministic, oracle-reproducible, and
    * stable under uniform brightness/contrast scaling (the property that
    * makes dHash a near-dup key rather than a checksum). */
  def dhash(img: PpmImage): Long = {
    val cells = new Array[Long](DhashW * DhashH)
    val counts = new Array[Long](DhashW * DhashH)
    var i = 0
    while (i < img.pixels.length) {
      val p = i / 3
      val y = p / img.width
      val x = p % img.width
      val cell = (y * DhashH / img.height) * DhashW + (x * DhashW / img.width)
      cells(cell) += (img.pixels(i) & 0xff)
      counts(cell) += 1
      i += 1
    }
    var h = 0L
    var r = 0
    while (r < DhashH) {
      var c = 0
      while (c < DhashW - 1) {
        val a = r * DhashW + c
        val b = a + 1
        if (cells(a) * counts(b) > cells(b) * counts(a))
          h |= 1L << (r * (DhashW - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Shared oracle CTE: per-doc UTF-8 byte values as a DuckDB list,
    * decoded from hex(encode(text)) (DuckDB cannot index BLOBs directly).
    * `body` selects from the `decoded(doc_id, lang, n, bs)` view. */
  def decodeOracle(body: String): String =
    s"""WITH hexed AS (
       |  SELECT doc_id, lang, hex(encode(text)) AS h,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |decoded AS (
       |  SELECT doc_id, lang, n,
       |    list_transform(range(1, n + 1), i ->
       |      16 * (strpos('0123456789ABCDEF', upper(substring(h, CAST(2*i-1 AS INT), 1))) - 1)
       |         + (strpos('0123456789ABCDEF', upper(substring(h, CAST(2*i AS INT), 1))) - 1)) AS bs
       |  FROM hexed)
       |$body""".stripMargin

  /** Oracle CTE reproducing the deterministic P6 framing: dimensions,
    * payload length (9 header bytes + the two dimension strings + the
    * pixel array) and the exact pixel sum of the cycled content bytes.
    * `body` selects from `feat(doc_id, lang, n, bs, w, h, k, byte_len,
    * pix_sum)`. */
  def ppmOracle(body: String): String = decodeOracle(
    """,
      |ppm AS (
      |  SELECT doc_id, lang, n, bs,
      |    4 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 8 END AS w,
      |    4 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 8 END AS h
      |  FROM decoded),
      |feat AS (
      |  SELECT doc_id, lang, n, bs, w, h, w*h*3 AS k,
      |    CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
      |         + w*h*3 AS BIGINT) AS byte_len,
      |    CAST(CASE WHEN n = 0 THEN 0 ELSE list_sum(list_transform(
      |      range(0, w*h*3), i -> bs[CAST((i % n) + 1 AS INT)])) END
      |      AS BIGINT) AS pix_sum
      |  FROM ppm)
      |""".stripMargin + body)

  /** Oracle CTE reproducing [[WavCodec.makeWav]]'s framing: sample count,
    * unsigned 16-bit words (with the even-sample hi-byte XOR), then the
    * signed decode. `body` selects from `wavf(doc_id, lang, n, ns, ss)`
    * where `ss` is the list of signed sample values. */
  def wavOracle(body: String): String = decodeOracle(
    """,
      |wavn AS (
      |  SELECT doc_id, lang, n, bs,
      |    32 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 64 END AS ns
      |  FROM decoded),
      |wavv AS (
      |  SELECT doc_id, lang, n, ns,
      |    list_transform(range(0, ns), k ->
      |      (CASE WHEN n = 0 THEN 0 ELSE bs[CAST((2*k) % n + 1 AS INT)] END
      |       + 256 * xor(CASE WHEN n = 0 THEN 0 ELSE bs[CAST((2*k+1) % n + 1 AS INT)] END,
      |                   CASE WHEN k % 2 = 0 THEN 128 ELSE 0 END))) AS vs
      |  FROM wavn),
      |wavf AS (
      |  SELECT doc_id, lang, n, ns,
      |    list_transform(vs, v -> v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END) AS ss
      |  FROM wavv)
      |""".stripMargin + body)

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("pix_sum", LongType),
    StructField("mean_byte", DoubleType)))

  private def decodeRow(payload: Array[Byte]): (Long, Int, Int, Int, Long, Double) = {
    val ppm = makePpm(payload)
    val img = decodePpm(ppm)
    var sum = 0L
    var i = 0
    while (i < img.pixels.length) { sum += (img.pixels(i) & 0xff); i += 1 }
    (ppm.length.toLong, img.width, img.height, img.channels, sum,
      sum.toDouble / (img.width * img.height * 3))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- binary payload metadata: oracle-checkable (length + digest) ----
    QueryDef("m01_binary_meta",
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        | sha256(text) AS digest
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
          sha2(col("text"), 256).as("digest"))
    },

    // ---- REAL image decode over the binary column via mapPartitions:
    // each doc's bytes are framed as a P6 ppm (deterministic encode) and
    // run through the genuine parser; emitted features come from the
    // DECODED header + pixel array. The oracle reproduces them from the
    // framing rule — byte_len covers the real variable-length ASCII
    // header, so a header-format drift in either codec half is a hash
    // mismatch. mean_byte is one exact-integer division (pix_sum / k),
    // bit-identical on both engines. ----
    QueryDef("m02_decode_stub", MultimodalQueries.ppmOracle(
      """SELECT doc_id, byte_len,
        | CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        | CAST(3 AS INT) AS channels, pix_sum,
        | CAST(pix_sum AS DOUBLE) / k AS mean_byte
        |FROM feat""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val (len, w, h, ch, sum, mean) = decodeRow(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), len, w, h, ch, sum, mean)
        }
      }(enc)
    },

    // ---- aggregate over decoded features (downstream-pipeline shape) ----
    QueryDef("m03_decoded_stats", MultimodalQueries.ppmOracle(
      """SELECT lang, count(*) AS n,
        | round(avg(w), 3) AS avg_w,
        | round(avg(h), 3) AS avg_h,
        | round(avg(CAST(pix_sum AS DOUBLE) / k), 3) AS avg_mean_byte
        |FROM feat GROUP BY lang""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text").cast("binary").as("payload"))
      val schema = StructType(StructField("lang", StringType) +: decodedSchema.fields.toSeq)
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val decoded = docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val (len, w, h, ch, sum, mean) = decodeRow(r.getAs[Array[Byte]](2))
          Row(r.getString(1), r.getLong(0), len, w, h, ch, sum, mean)
        }
      }(enc)
      decoded.groupBy("lang").agg(
        count(lit(1)).as("n"),
        round(avg("width"), 3).as("avg_w"),
        round(avg("height"), 3).as("avg_h"),
        round(avg("mean_byte"), 3).as("avg_mean_byte"))
    },

    // ---- REAL resize over the decoded pixel grid: box-filter
    // downsample to a 2×2 grid, exact per-quadrant sums across the RGB
    // channels (the accumulation pass of every real resizer — the
    // division into averages is the caller's one scalar op). Per-row,
    // zero shuffle. The oracle replays the same quadrant assignment
    // (y*2 div h, x*2 div w) over the cycled content bytes. ----
    QueryDef("m04_resize_stub", MultimodalQueries.ppmOracle(
      (0 until 4).map { b =>
        s"""CAST(CASE WHEN n = 0 THEN 0 ELSE coalesce(list_sum(list_transform(
           |   list_filter(range(0, k),
           |     i -> ((i // (3*w)) * 2 // h) * 2 + (((i // 3) % w) * 2 // w) = $b),
           |   i -> bs[CAST((i % n) + 1 AS INT)])), 0) END AS BIGINT) AS s$b""".stripMargin
      }.mkString("SELECT doc_id, ", ",\n ", "\nFROM feat"))) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(StructField("doc_id", LongType) +:
        (0 until 4).map(b => StructField(s"s$b", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val img = decodePpm(makePpm(r.getAs[Array[Byte]](1)))
          Row.fromSeq(r.getLong(0) +: resizeSums(img).toSeq)
        }
      }(enc)
    },

    // ---- frame sampling over the binary column: one output row per
    // sampled frame (flatMap shape — decode emits 0..n rows per input).
    // The payload is interpreted as fixed 64-byte frames (every 3rd
    // kept) — the honest stand-in for a container-format demuxer, which
    // no pure-JVM library in this image provides. ----
    QueryDef("m05_frame_sample", MultimodalQueries.decodeOracle(
      s"""SELECT doc_id, CAST(k AS INT) AS frame_idx,
         | CAST(list_sum([bs[CAST(k*${MultimodalQueries.frameLen} + j AS INT)]
         |   for j in range(1, ${MultimodalQueries.frameLen} + 1)]) AS BIGINT) AS frame_sum
         |FROM decoded, unnest(range(0, n//${MultimodalQueries.frameLen})) AS u(k)
         |WHERE k % ${MultimodalQueries.frameStride} = 0""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("frame_sum", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val frames = payload.length / MultimodalQueries.frameLen
          (0 until frames by MultimodalQueries.frameStride).iterator.map { k =>
            var sum = 0L
            var j = k * MultimodalQueries.frameLen
            val end = j + MultimodalQueries.frameLen
            while (j < end) { sum += (payload(j) & 0xff); j += 1 }
            Row(id, k, sum)
          }
        }
      }(enc)
    },

    // ---- REAL audio decode: each doc's bytes are framed as a genuine
    // PCM WAV (deterministic encode, junk LIST chunk included) and run
    // through the real RIFF chunk-walking parser; every emitted feature
    // comes from the PARSED structure (byte_len covers the full RIFF
    // layout, sample_rate/num_samples from the fmt/data chunks, and the
    // L1 energy / peak / DC offset from the signed-decoded samples — all
    // exact integers). A header-layout or signed-decode drift in either
    // codec half is a hash mismatch. Per-row, zero shuffle. ----
    QueryDef("m06_audio_decode", MultimodalQueries.wavOracle(
      """SELECT doc_id, CAST(56 + 2*ns AS BIGINT) AS byte_len,
        | 8000 AS sample_rate, CAST(ns AS BIGINT) AS num_samples,
        | CAST(list_sum(list_transform(ss, s -> abs(s))) AS BIGINT) AS energy_l1,
        | CAST(list_max(list_transform(ss, s -> abs(s))) AS BIGINT) AS peak,
        | CAST(list_sum(ss) AS BIGINT) AS dc_sum
        |FROM wavf""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("byte_len", LongType),
        StructField("sample_rate", IntegerType),
        StructField("num_samples", LongType),
        StructField("energy_l1", LongType),
        StructField("peak", LongType),
        StructField("dc_sum", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val bytes = WavCodec.makeWav(r.getAs[Array[Byte]](1))
          val wav = WavCodec.decodeWav(bytes)
          var e = 0L; var p = 0L; var dc = 0L
          var i = 0
          while (i < wav.samples.length) {
            val v = wav.samples(i).toLong
            e += math.abs(v); p = math.max(p, math.abs(v)); dc += v
            i += 1
          }
          Row(r.getLong(0), bytes.length.toLong, wav.sampleRate,
            wav.samples.length.toLong, e, p, dc)
        }
      }(enc)
    },

    // ---- audio frame energy (m05's flatMap shape over DECODED samples):
    // 16-sample frames, every 2nd kept, per-frame sum of squared samples
    // (the RMS numerator — exact long, bounded 16 x 32768^2). ----
    QueryDef("m07_audio_frames", MultimodalQueries.wavOracle(
      s"""SELECT doc_id, CAST(f AS INT) AS frame_idx,
         | CAST(list_sum([ss[CAST(f*${WavCodec.frameSamples} + j + 1 AS INT)]
         |              * ss[CAST(f*${WavCodec.frameSamples} + j + 1 AS INT)]
         |   for j in range(0, ${WavCodec.frameSamples})]) AS BIGINT) AS sq_sum
         |FROM wavf, unnest(range(0, ns // ${WavCodec.frameSamples})) AS u(f)
         |WHERE f % ${WavCodec.frameStride} = 0""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("sq_sum", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val wav = WavCodec.decodeWav(WavCodec.makeWav(r.getAs[Array[Byte]](1)))
          val frames = wav.samples.length / WavCodec.frameSamples
          (0 until frames by WavCodec.frameStride).iterator.map { f =>
            var sq = 0L
            var j = f * WavCodec.frameSamples
            val end = j + WavCodec.frameSamples
            while (j < end) {
              val v = wav.samples(j).toLong
              sq += v * v; j += 1
            }
            Row(id, f, sq)
          }
        }
      }(enc)
    },

    // ---- REAL video container demux (m05's upgrade): each doc's bytes
    // are framed as a genuine RIFF/AVI-style container (hdrl LIST with
    // an avih header, movi LIST of 00db frame chunks, word-aligned) and
    // run through the real demuxer — chunk-tree walk, declared-size and
    // avih-consistency validation, then the REAL P6 parser per frame.
    // One output row per demuxed frame (flatMap); every emitted value
    // comes from the PARSED structures, and the oracle replays the
    // framing rule (same-dims frames, pixels cycled from offset f). ----
    QueryDef("m08_video_demux", MultimodalQueries.decodeOracle(
      """,
        |dims AS (
        |  SELECT doc_id, n, bs,
        |    4 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 8 END AS w,
        |    4 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 8 END AS h,
        |    2 + CASE WHEN n < 3 THEN 0 ELSE bs[3] % 4 END AS nf
        |  FROM decoded),
        |geo AS (
        |  SELECT doc_id, n, bs, w, h, nf, w*h*3 AS k,
        |    9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w*h*3 AS ppm_len
        |  FROM dims)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE list_sum(list_transform(
        |    range(0, k), j -> bs[CAST((j + f) % n + 1 AS INT)])) END AS BIGINT) AS pix_sum,
        |  CAST(60 + nf*(8 + ppm_len + ppm_len % 2) AS BIGINT) AS byte_len
        |FROM geo, unnest(range(0, nf)) AS u(f)""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", IntegerType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("pix_sum", LongType),
        StructField("byte_len", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val container = AviCodec.makeAvi(r.getAs[Array[Byte]](1))
          val video = AviCodec.decodeAvi(container)
          video.frames.iterator.map { fr =>
            var sum = 0L
            var i = 0
            while (i < fr.image.pixels.length) {
              sum += (fr.image.pixels(i) & 0xff); i += 1
            }
            Row(id, fr.idx, fr.image.width, fr.image.height, sum,
              container.length.toLong)
          }
        }
      }(enc)
    },

    // ---- perceptual image hashing / image near-dup (m09): dHash over
    // the REAL decoded pixel grid — integer cell sums on a fixed 5×4
    // grid, one bit per horizontally adjacent cell pair (16 bits). The
    // hash itself is a zero-shuffle per-row kernel (decode + one pass
    // over the pixels); the near-dup verdict is ONE shuffle on the
    // 16-bit key (window count per hash — d04's exact-dedup shape, so
    // at 100 TB this is a hash-partitioned image-dedup pass whose keys
    // are 2 bytes, not the image). The oracle replays the exact cell
    // assignment (y*DhashH div h, x*DhashW div w) over the cycled
    // content bytes, including cells the raster never hits (w=4 leaves
    // grid column 4 empty → coalesce 0), so a grid-geometry or
    // bit-order drift in the kernel is a hash mismatch. ----
    QueryDef("m09_image_dhash", MultimodalQueries.ppmOracle(
      s""",
         |px AS (
         |  SELECT doc_id,
         |    ((i // (3*w)) * ${MultimodalQueries.DhashH} // h) * ${MultimodalQueries.DhashW}
         |      + (((i // 3) % w) * ${MultimodalQueries.DhashW} // w) AS cell,
         |    CASE WHEN n = 0 THEN 0 ELSE bs[CAST((i % n) + 1 AS INT)] END AS v
         |  FROM feat, unnest(range(0, k)) AS u(i)),
         |sums AS (SELECT doc_id, cell, sum(v) AS s, count(*) AS cnt
         |         FROM px GROUP BY doc_id, cell),
         |grid AS (
         |  SELECT d.doc_id, g.cell, coalesce(s.s, 0) AS s, coalesce(s.cnt, 0) AS cnt
         |  FROM (SELECT DISTINCT doc_id FROM feat) d
         |  CROSS JOIN unnest(range(0, ${MultimodalQueries.DhashW * MultimodalQueries.DhashH})) AS g(cell)
         |  LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.cell = g.cell),
         |hsh AS (
         |  SELECT a.doc_id,
         |    sum(CASE WHEN a.s * b.cnt > b.s * a.cnt
         |      THEN CAST(1 AS BIGINT) << CAST((a.cell // ${MultimodalQueries.DhashW}) * ${MultimodalQueries.DhashW - 1}
         |        + (a.cell % ${MultimodalQueries.DhashW}) AS INT)
         |      ELSE 0 END) AS dhash
         |  FROM grid a JOIN grid b
         |    ON b.doc_id = a.doc_id AND b.cell = a.cell + 1
         |  WHERE a.cell % ${MultimodalQueries.DhashW} < ${MultimodalQueries.DhashW - 1}
         |  GROUP BY a.doc_id)
         |SELECT f.doc_id, CAST(f.w AS INT) AS width, CAST(f.h AS INT) AS height,
         |  CAST(h.dhash AS BIGINT) AS dhash,
         |  CAST(count(*) OVER (PARTITION BY h.dhash) AS BIGINT) AS dup_cnt
         |FROM feat f JOIN hsh h ON h.doc_id = f.doc_id""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("dhash", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val hashed = docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val img = decodePpm(makePpm(r.getAs[Array[Byte]](1)))
          Row(r.getLong(0), img.width, img.height, dhash(img))
        }
      }(enc)
      hashed.withColumn("dup_cnt",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("dhash")).cast("long"))
    },

    // ---- format sniffing / modality router (m10): a heterogeneous
    // binary column (each doc framed as PPM, WAV, or AVI by doc_id % 3)
    // routed by MAGIC BYTES alone — 'P6' for PPM; RIFF containers need
    // bytes 8..11 ('WAVE' vs 'AVI ') because the 4-byte magic is shared
    // — then dispatched to the matching REAL parser. This is the
    // ingest-side dispatch every mixed-modality manifest needs before
    // any per-format op (m02-m09) can run. The oracle independently
    // derives what each doc's format and container length MUST be from
    // the content bytes and the three framing formulas, so a sniffing
    // or framing drift on any branch is a hash mismatch; parsed_ok
    // additionally requires the real decoder to accept the routed
    // payload. Zero shuffle — one mapPartitions projection. ----
    QueryDef("m10_format_router", MultimodalQueries.decodeOracle(
      """,
        |geo AS (
        |  SELECT doc_id, n, bs,
        |    4 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 8 END AS w,
        |    4 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 8 END AS h,
        |    2 + CASE WHEN n < 3 THEN 0 ELSE bs[3] % 4 END AS nf,
        |    32 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 64 END AS ns
        |  FROM decoded),
        |fmt AS (
        |  SELECT doc_id, n, w, h, nf, ns,
        |    9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w*h*3 AS ppm_len
        |  FROM geo)
        |SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav' ELSE 'avi' END AS detected,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN ppm_len
        |    WHEN 1 THEN 56 + 2 * ns
        |    ELSE 60 + nf * (8 + ppm_len + ppm_len % 2) END AS BIGINT) AS byte_len,
        |  true AS parsed_ok
        |FROM fmt""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("detected", StringType),
        StructField("byte_len", LongType),
        StructField("parsed_ok", BooleanType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          val container = (id % 3) match {
            case 0 => makePpm(content)
            case 1 => WavCodec.makeWav(content)
            case _ => AviCodec.makeAvi(content)
          }
          def ascii(at: Int): String =
            if (container.length >= at + 4)
              new String(container, at, 4, "US-ASCII")
            else ""
          // sniff from the bytes alone — the id plays no part here
          val detected =
            if (container.length >= 2 && container(0) == 'P'.toByte &&
              container(1) == '6'.toByte) "ppm"
            else if (ascii(0) == "RIFF" && ascii(8) == "WAVE") "wav"
            else if (ascii(0) == "RIFF" && ascii(8) == "AVI ") "avi"
            else "unknown"
          val ok = detected match {
            case "ppm" => decodePpm(container).width > 0
            case "wav" => WavCodec.decodeWav(container).samples.nonEmpty
            case "avi" => AviCodec.decodeAvi(container).frames.nonEmpty
            case _     => false
          }
          Row(id, detected, container.length.toLong, ok)
        }
      }(enc)
    },

    // ---- REAL entropy-coded codec (m11): each document's bytes are
    // framed as a zlib/DEFLATE stream (stored block + fixed-Huffman
    // block with one LZ77 match — DeflateCodec.deflateFrame, a pure
    // function of the content bytes) and decoded back through the real
    // inflater (bit-level Huffman decode, match copy, Adler-32 verify).
    // The emitted features are byte math over the DECODED output
    // (content ++ match copy), which DuckDB replays from the same
    // content bytes — the m02 recipe at an entropy-coded boundary. Two
    // in-band proofs ride along: roundtrip_ok (the inflater reproduces
    // the framing contract exactly) and interop_ok (java.util.zip's
    // Inflater agrees byte-for-byte on the same stream — the codec is
    // interoperable, not self-consistent). Per-row mapPartitions batch
    // decode, zero shuffle — the Pandas-batch-UDF shape. ----
    QueryDef("m11_inflate", MultimodalQueries.decodeOracle(
      """,
        |ext AS (
        |  SELECT doc_id, n, bs,
        |    CASE WHEN n = 0 THEN 0 ELSE 3 + bs[1] % 8 END AS l,
        |    CASE WHEN n > 32768 THEN 32768 ELSE n END AS d
        |  FROM decoded),
        |raw AS (
        |  SELECT doc_id, n + l AS nr,
        |    CASE WHEN n = 0 THEN CAST([] AS BIGINT[]) ELSE
        |      list_concat(bs, list_transform(range(0, l),
        |        j -> bs[CAST(n - d + 1 + (j % d) AS INT)])) END AS rs
        |  FROM ext),
        |feat AS (
        |  SELECT doc_id, CAST(nr AS BIGINT) AS n_raw,
        |    CAST(COALESCE(list_sum(rs), 0) AS BIGINT) AS raw_sum,
        |    CAST(((nr + COALESCE(list_sum(list_transform(range(1, nr + 1),
        |        i -> (nr - i + 1) * rs[CAST(i AS INT)])), 0)) % 65521) * 65536
        |      + (1 + COALESCE(list_sum(rs), 0)) % 65521 AS BIGINT) AS adler
        |  FROM raw)
        |SELECT doc_id, n_raw, raw_sum, adler,
        |  true AS roundtrip_ok, true AS interop_ok
        |FROM feat""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("n_raw", LongType),
        StructField("raw_sum", LongType),
        StructField("adler", LongType),
        StructField("roundtrip_ok", BooleanType),
        StructField("interop_ok", BooleanType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        val buf = new Array[Byte](4096)
        it.map { r =>
          val content = r.getAs[Array[Byte]](1)
          val frame = DeflateCodec.deflateFrame(content)
          val decoded = DeflateCodec.inflate(frame) // the REAL decode
          var sum = 0L
          var i = 0
          while (i < decoded.length) { sum += decoded(i) & 0xff; i += 1 }
          val roundtrip = java.util.Arrays.equals(
            decoded, DeflateCodec.decodedOf(content))
          val inf = new java.util.zip.Inflater()
          inf.setInput(frame)
          val jout = new java.io.ByteArrayOutputStream()
          while (!inf.finished()) {
            val k = inf.inflate(buf)
            if (k == 0 && !inf.finished())
              throw new IllegalStateException("java inflater stalled")
            jout.write(buf, 0, k)
          }
          inf.end()
          val interop = java.util.Arrays.equals(jout.toByteArray, decoded)
          Row(r.getLong(0), decoded.length.toLong, sum,
            DeflateCodec.adler32(decoded, decoded.length), roundtrip, interop)
        }
      }(enc)
    },

    // ---- Container codec above the entropy boundary (m12): each
    // document becomes a deterministic 8-bit grayscale PNG — dims
    // 4+b₁%8 × 4+b₂%8 (the P6 recipe), pixel(r,c) = content byte
    // cycled — encoded with filter type row%5 (all five PNG filters
    // exercised) and a zlib IDAT, then decoded back through the REAL
    // path: chunk walk with CRC-32 verify on every chunk, m11 inflate,
    // scanline filter reconstruction. Emitted pixel sums are computed
    // FROM THE DECODED pixels, which DuckDB replays directly from the
    // content-cycling definition — any un-filter or inflate defect
    // breaks the hash. Three in-band proofs: filters_ok (decoded
    // pixels == definition), crc_ok (every chunk CRC verified on the
    // decode path), interop_ok (javax.imageio's independent PNG reader
    // agrees pixel-for-pixel). Per-row mapPartitions decode, zero
    // shuffle. ----
    QueryDef("m12_png_decode", MultimodalQueries.decodeOracle(
      """,
        |dims AS (
        |  SELECT doc_id, n, bs,
        |    4 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 8 END AS w,
        |    4 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 8 END AS h
        |  FROM decoded),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_transform(range(0, w * h), i ->
        |      CASE WHEN n = 0 THEN 0 ELSE bs[CAST(i % n + 1 AS INT)] END) AS ps
        |  FROM dims),
        |feat AS (
        |  SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |    CAST(w * h AS BIGINT) AS n_pix,
        |    CAST(COALESCE(list_sum(ps), 0) AS BIGINT) AS pix_sum,
        |    CAST(COALESCE(list_sum(list_transform(range(1, w * h + 1),
        |      i -> i * ps[CAST(i AS INT)])), 0) AS BIGINT) AS pix_wsum
        |  FROM px)
        |SELECT doc_id, width, height, n_pix, pix_sum, pix_wsum,
        |  true AS filters_ok, true AS crc_ok, true AS interop_ok
        |FROM feat""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", LongType),
        StructField("height", LongType),
        StructField("n_pix", LongType),
        StructField("pix_sum", LongType),
        StructField("pix_wsum", LongType),
        StructField("filters_ok", BooleanType),
        StructField("crc_ok", BooleanType),
        StructField("interop_ok", BooleanType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val content = r.getAs[Array[Byte]](1)
          val n = content.length
          val w = 4 + (if (n == 0) 0 else content(0) & 0x07)
          val h = 4 + (if (n < 2) 0 else content(1) & 0x07)
          val direct = Array.tabulate(w * h)(i =>
            if (n == 0) 0 else content(i % n) & 0xff)
          val png = PngCodec.encodePng(w, h, direct)
          val dec = PngCodec.decodePng(png) // the REAL decode; crc_ok by
          // reaching here — decodePng verifies every chunk CRC
          val filtersOk = java.util.Arrays.equals(dec.pixels, direct)
          var sum = 0L; var wsum = 0L
          var i = 0
          while (i < dec.pixels.length) {
            sum += dec.pixels(i); wsum += (i + 1).toLong * dec.pixels(i)
            i += 1
          }
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          val raster = img.getRaster
          var interop = img.getWidth == w && img.getHeight == h
          var rr = 0
          while (interop && rr < h) {
            var cc = 0
            while (interop && cc < w) {
              if (raster.getSample(cc, rr, 0) != dec.pixels(rr * w + cc))
                interop = false
              cc += 1
            }
            rr += 1
          }
          Row(r.getLong(0), w.toLong, h.toLong, (w * h).toLong, sum, wsum,
            filtersOk, true, interop)
        }
      }(enc)
    }
  )
}
