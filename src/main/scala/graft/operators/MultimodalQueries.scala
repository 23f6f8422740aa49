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
    }
  )
}
