package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.Fingerprint64

/** Gate entries for the native fingerprint expression and the salted
  * (skew-resistant) aggregation pattern. */
object FingerprintQueries {

  val defs: Seq[QueryDef] = Seq(

    // Native codegen'd FNV-1a fingerprint over documents. FNV-1a is fully
    // specified (offset 0xcbf29ce484222325, prime 0x100000001b3), so the
    // oracle reproduces the byte loop in DuckDB: list_reduce over UTF-8
    // bytes in HUGEINT with mod-2^64 wraparound, folded back to a signed
    // BIGINT. A full rows+schema+hash gate on a custom codegen expression.
    QueryDef("d08_fingerprint64", MultimodalQueries.decodeOracle(
      """SELECT doc_id, fp,
        | CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_same_fp
        |FROM (
        |  SELECT doc_id,
        |    CAST(CASE WHEN r >= 9223372036854775808::HUGEINT
        |              THEN r - 18446744073709551616::HUGEINT ELSE r END
        |         AS BIGINT) AS fp
        |  FROM (
        |    SELECT doc_id,
        |      list_reduce(
        |        list_prepend(14695981039346656037::HUGEINT,
        |          list_transform(bs, b -> CAST(b AS HUGEINT))),
        |        (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
        |                  % 18446744073709551616::HUGEINT) AS r
        |    FROM decoded) t1) t2""".stripMargin)) { (s, dir) =>
      Fingerprint64.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          Fingerprint64.fingerprint64(col("text")).as("fp"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(Fingerprint64.fingerprint64(col("text"))))
            .as("n_same_fp"))
    },

    // Deterministic content-hash sampling + train/val/test splitting: the
    // canonical reproducible-pipeline op (any worker, any run, any engine
    // assigns the same doc to the same split because the bucket is a pure
    // function of the CONTENT fingerprint, not of row order or RNG state).
    // 80/10/10 by FNV-1a bucket; oracle reproduces the fold in DuckDB.
    QueryDef("d11_hash_split", MultimodalQueries.decodeOracle(
      """SELECT lang, split, count(*) AS n,
        | CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS sum_bytes
        |FROM (
        |  SELECT lang, n,
        |    CASE WHEN bucket < 80 THEN 'train'
        |         WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (
        |    SELECT lang, n,
        |      CAST(list_reduce(
        |        list_prepend(14695981039346656037::HUGEINT,
        |          list_transform(bs, b -> CAST(b AS HUGEINT))),
        |        (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
        |                  % 18446744073709551616::HUGEINT) % 100
        |        AS BIGINT) AS bucket
        |    FROM decoded) t1) t2
        |GROUP BY lang, split""".stripMargin)) { (s, dir) =>
      Fingerprint64.register(s)
      // fp is the signed-long view of the unsigned 64-bit FNV value U
      // (U = fp, or fp + 2^64 when fp < 0). The oracle buckets on
      // U % 100; in long arithmetic that is
      // pmod(pmod(fp, 100) + (fp < 0 ? 2^64 % 100 = 16 : 0), 100).
      val fp = Fingerprint64.fingerprint64(col("text"))
      val unsignedMod =
        expr("pmod(pmod(fp, 100L) + IF(fp < 0, 16L, 0L), 100L)")
      Tables.load(s, dir, "documents")
        .select(col("lang"), col("text"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .withColumn("fp", fp)
        .withColumn("bucket", unsignedMod)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("sum_bytes"))
    },

    // Stratified deterministic sampling: per-language keep rates over the
    // same content-fingerprint buckets as d11 (en 50%, de 25%, rest 10%)
    // — the corpus-rebalancing op (downsample the dominant language,
    // keep the tail). Membership is a pure function of CONTENT, so any
    // engine, any run, any partitioning keeps exactly the same docs. The
    // keep-filter itself is a zero-shuffle per-row predicate; only the
    // audit counts aggregate here.
    QueryDef("d15_stratified_sample", MultimodalQueries.decodeOracle(
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
        | CAST(sum(CASE WHEN bucket < (CASE lang WHEN 'en' THEN 50
        |                              WHEN 'de' THEN 25 ELSE 10 END)
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM (
        |  SELECT lang,
        |    CAST(list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(bs, b -> CAST(b AS HUGEINT))),
        |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
        |                % 18446744073709551616::HUGEINT) % 100
        |      AS BIGINT) AS bucket
        |  FROM decoded) t
        |GROUP BY lang""".stripMargin)) { (s, dir) =>
      Fingerprint64.register(s)
      // same unsigned-mod bridge as d11 (see comment there)
      val fp = Fingerprint64.fingerprint64(col("text"))
      val unsignedMod =
        expr("pmod(pmod(fp, 100L) + IF(fp < 0, 16L, 0L), 100L)")
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "de", 25L).otherwise(10L)
      Tables.load(s, dir, "documents")
        .select(col("lang"), col("text"))
        .withColumn("fp", fp)
        .withColumn("bucket", unsignedMod)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("bucket") < rate, 1L).otherwise(0L)).as("n_kept"))
    },

    // Salted two-phase aggregation: the skew pattern for hot keys at
    // scale. l_returnflag has only 3 values — a direct groupBy lands all
    // 600k rows on 3 reducers; salting fans the partial aggregation over
    // salt*keys reducers, then the cheap final phase merges 16 rows/key.
    // Semantically identical to a plain GROUP BY, which is the oracle.
    QueryDef("q34_salted_agg",
      """SELECT l_returnflag, round(sum(l_extendedprice),3) AS total,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val salted = Tables.load(s, dir, "lineitem")
        .withColumn("__salt", (rand(seed = 42) * 16).cast("int"))
        .groupBy(col("l_returnflag"), col("__salt"))
        .agg(sum("l_extendedprice").as("partial_total"),
          count(lit(1)).as("partial_n"))
      salted.groupBy("l_returnflag")
        .agg(round(sum("partial_total"), 3).as("total"),
          sum("partial_n").as("n"))
    }
  )
}
