package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in batch per partition. The container has no image/
  * audio codecs, so the decode step is a clearly-marked deterministic STUB
  * (`fakeDecode`) — but everything Spark-side is real and tested: schema,
  * binary payload handling, partition-parallel batch processing via
  * mapPartitions (the Scala analog of a Pandas-batch UDF: one iterator per
  * partition, no per-row driver involvement, executes distributed).
  */
object MultimodalQueries {

  /** STUB decoder: stands in for image/audio decode. Deterministic feature
    * extraction from raw bytes — replace with a real codec in production.
    * Returns (width, height, channels, meanByte). */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? real codec goes here; deterministic fake derived from content:
    val n = payload.length
    val w = 16 + (if (n == 0) 0 else (payload(0) & 0x7f))
    val h = 16 + (if (n < 2) 0 else (payload(1) & 0x7f))
    val ch = 1 + (if (n < 3) 0 else (payload(2) & 0x03))
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (w, h, ch, mean)
  }

  /** STUB resize: stands in for image thumbnail/resample. Maps the byte
    * grid onto a fixed K-bucket grid (bucket of 0-based byte i = i*K/n)
    * and emits exact per-bucket sums — the downsample every real resizer
    * performs, minus the codec. Exact longs keep the oracle hash-stable. */
  val resizeBuckets = 8
  def fakeResize(payload: Array[Byte]): Array[Long] = {
    // ??? real resample goes here; bucketed byte sums derived from content
    val out = new Array[Long](resizeBuckets)
    val n = payload.length
    var i = 0
    while (i < n) {
      out((i.toLong * resizeBuckets / n).toInt) += (payload(i) & 0xff)
      i += 1
    }
    out
  }

  /** STUB frame sampling: stands in for video frame extraction. Treats the
    * payload as fixed-size frames (64 bytes), keeps every 3rd complete
    * frame, and emits the exact byte sum per sampled frame. */
  val frameLen = 64
  val frameStride = 3

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

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_byte", DoubleType)))

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

    // ---- batch "decode" over binary column via mapPartitions.
    // Oracle-checkable: fakeDecode is deterministic byte arithmetic, so
    // the same features are computable in DuckDB from hex(encode(text))
    // (no rounding needed: width/height/channels are ints and mean_byte
    // is BIGINT sum / count — the double division is bit-identical). ----
    QueryDef("m02_decode_stub", MultimodalQueries.decodeOracle(
      """SELECT doc_id, CAST(n AS BIGINT) AS byte_len,
        | CAST(16 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 128 END AS INT) AS width,
        | CAST(16 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 128 END AS INT) AS height,
        | CAST(1 + CASE WHEN n < 3 THEN 0 ELSE bs[3] % 4 END AS INT) AS channels,
        | CASE WHEN n = 0 THEN 0.0 ELSE CAST(list_sum(bs) AS DOUBLE) / n END AS mean_byte
        |FROM decoded""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, ch, mean) = fakeDecode(payload)
          Row(id, payload.length.toLong, w, h, ch, mean)
        }
      }(enc)
    },

    // ---- aggregate over decoded features (downstream-pipeline shape) ----
    QueryDef("m03_decoded_stats", MultimodalQueries.decodeOracle(
      """SELECT lang, count(*) AS n,
        | round(avg(16 + CASE WHEN n = 0 THEN 0 ELSE bs[1] % 128 END), 3) AS avg_w,
        | round(avg(16 + CASE WHEN n < 2 THEN 0 ELSE bs[2] % 128 END), 3) AS avg_h,
        | round(avg(CASE WHEN n = 0 THEN 0.0 ELSE CAST(list_sum(bs) AS DOUBLE) / n END), 3)
        |   AS avg_mean_byte
        |FROM decoded GROUP BY lang""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text").cast("binary").as("payload"))
      val schema = StructType(StructField("lang", StringType) +: decodedSchema.fields.toSeq)
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val decoded = docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val lang = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val (w, h, ch, mean) = fakeDecode(payload)
          Row(lang, id, payload.length.toLong, w, h, ch, mean)
        }
      }(enc)
      decoded.groupBy("lang").agg(
        count(lit(1)).as("n"),
        round(avg("width"), 3).as("avg_w"),
        round(avg("height"), 3).as("avg_h"),
        round(avg("mean_byte"), 3).as("avg_mean_byte"))
    },

    // ---- fixed-grid "resize" over the binary column: per-row, zero
    // shuffle; exact bucket sums make the stub oracle-checkable. ----
    QueryDef("m04_resize_stub", MultimodalQueries.decodeOracle(
      (0 until MultimodalQueries.resizeBuckets).map { b =>
        s"""CAST(coalesce(list_sum([bs[CAST(i AS INT)]
           |   for i in range(1, n + 1) if ((i-1)*${MultimodalQueries.resizeBuckets})//n = $b]), 0) AS BIGINT) AS b$b""".stripMargin
      }.mkString("SELECT doc_id, ", ",\n ", "\nFROM decoded"))) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val schema = StructType(StructField("doc_id", LongType) +:
        (0 until MultimodalQueries.resizeBuckets)
          .map(b => StructField(s"b$b", LongType)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      docs.mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val sums = fakeResize(r.getAs[Array[Byte]](1))
          Row.fromSeq(r.getLong(0) +: sums.toSeq)
        }
      }(enc)
    },

    // ---- frame sampling over the binary column: one output row per
    // sampled frame (flatMap shape — decode emits 0..n rows per input). ----
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
    }
  )
}
