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
